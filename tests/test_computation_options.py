"""Computation knobs (gsnap -Y/-Z/--indel-endlength,
--query-unk-mismatch/--genome-unk-mismatch, --pairexpect,
--pairmax-dna/rna defaults, --merge-distant-samechr)."""
import numpy as np
import pytest

from tpumap.gsnap.driver import _indel_limits_ok, align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.gsnap.paired import _concordant_pairs
from tpumap.io.fasta import Record
from tpumap.ops.dp import T_DEL, T_INS, T_MATCH


def test_indel_limits_runs():
    M, I, D = T_MATCH, T_INS, T_DEL
    ops = [M] * 10 + [D] * 3 + [M] * 10
    assert _indel_limits_ok(ops, 6, 9, 4)
    assert not _indel_limits_ok(ops, 6, 2, 4)          # -Z 2 rejects 3D
    ops_i = [M] * 10 + [I] * 7 + [M] * 10
    assert not _indel_limits_ok(ops_i, 6, 9, 4)        # -Y 6 rejects 7I
    assert _indel_limits_ok(ops_i, 7, 9, 4)
    short_end = [M] * 2 + [D] * 2 + [M] * 20
    assert not _indel_limits_ok(short_end, 6, 9, 4)    # end run < 4
    assert _indel_limits_ok(short_end, 6, 9, 2)
    assert _indel_limits_ok([M] * 30, 0, 0, 99)        # no indel: free


def test_concordant_pairexpect_tiebreak():
    # two equal-score pairings with inserts ~300 and ~900
    d1 = np.array([1000, 0xFFFFFFFF], np.uint32)
    s1 = np.array([0, 0], np.int32)
    n1 = np.array([0, 0], np.int32)
    d2 = np.array([1200, 1800], np.uint32)   # inserts 300, 900
    s2 = np.array([1, 1], np.int32)
    n2 = np.array([0, 0], np.int32)
    best_near = _concordant_pairs((d1, s1, n1), (d2, s2, n2), 100, 100,
                                  2000)
    assert best_near[3] == 300               # default: smallest insert
    best_exp = _concordant_pairs((d1, s1, n1), (d2, s2, n2), 100, 100,
                                 2000, pairexpect=1000)
    assert best_exp[3] == 900                # closest to pairexpect


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    d = tmp_path_factory.mktemp("knobs")
    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    return db, DeviceIndex.from_host(db), seq


def test_max_deletions_enforced(world):
    db, index, seq = world
    p = 3000
    read = seq[p:p + 50] + seq[p + 62:p + 112]      # 12-base deletion
    out_def = align_records(db, index, [Record("d12", "", read)])
    assert "12D" not in out_def[0].cigar            # -Z default 9
    out_wide = align_records(db, index, [Record("d12", "", read)],
                             max_deletions=20)
    assert "12D" in out_wide[0].cigar


def test_query_unk_mismatch_semantics(world):
    db, index, seq = world
    p = 5000
    s = list(seq[p:p + 80])
    for k in range(0, 60, 5):                        # 12 Ns scattered
        s[k] = "N"
    rec = Record("nn", "", "".join(s))
    strict = align_records(db, index, [rec],
                           AlignConfig(query_unk_mismatch=True))
    assert strict[0].flag & 4                        # 12 "mismatches" > 8
    lenient = align_records(db, index, [rec],
                            AlignConfig(query_unk_mismatch=False))
    assert not lenient[0].flag & 4
    assert lenient[0].pos == p + 1


def test_merge_distant_samechr(world):
    db, index, seq = world
    # distant same-chromosome colinear split: 15000-base "intron" is
    # beyond max_intron so only the fusion stage can join it
    read = seq[1000:1060] + seq[16000:16040]
    plain = align_records(db, index, [Record("m1", "", read)],
                          find_fusions=True, max_intron=5000)
    assert len(plain) == 2                           # primary + supp
    merged = align_records(db, index, [Record("m1", "", read)],
                           find_fusions=True, max_intron=5000,
                           merge_distant_samechr=True)
    assert len(merged) == 1
    assert "N" in merged[0].cigar
    assert merged[0].cigar == f"60M{16000 - 1060}N40M"


def test_quality_weighted_mapq(world, tmp_path):
    """MAPQ_loglik_string role (src/mapq.c): mismatches on LOW-quality
    bases should cost less confidence than the same mismatches on
    high-quality bases (FASTQ input plumbs quals through the cascade).

    The genome carries a near-duplicate of the read's region (4 subs) so
    a real runner-up exists and MAPQ is off the cap."""
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    _, _, seq = world
    p = 7000
    dup = list(seq[p:p + 100])
    for j in (40,):
        dup[j] = "ACGT"[("ACGT".index(dup[j]) + 1) % 4]
    g2 = seq + "TTTT" + "".join(dup) + seq[:500]
    (tmp_path / "g.fa").write_text(">chr1\n" + g2 + "\n")
    db = build_db(tmp_path / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    s = list(seq[p:p + 100])
    mmpos = [20, 60]
    for j in mmpos:
        s[j] = "ACGT"[("ACGT".index(s[j]) + 1) % 4]
    read = "".join(s)

    def qual(low_at_mm):
        q = ["5"] * 100                       # Q20 baseline
        for j in mmpos:
            q[j] = "#" if low_at_mm else "I"  # mismatches at Q2 vs Q40
        return "".join(q)

    lo = align_records(db, index,
                       [Record("lo", "", read, qual(True))])[0]
    hi = align_records(db, index,
                       [Record("hi", "", read, qual(False))])[0]
    assert not lo.flag & 4 and not hi.flag & 4
    assert lo.pos == hi.pos == p + 1
    assert lo.mapq > hi.mapq, (lo.mapq, hi.mapq)
    # flat-quality FASTA input still works
    fa = align_records(db, index, [Record("fa", "", read)])[0]
    assert fa.mapq > 0
