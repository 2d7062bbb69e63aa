"""Two-pass learning (--two-pass, --splices-dump/--splices-read):
junction extraction from pass-1 alignments, and the pass-2 snap of
junction placements that pass 1 got only approximately right
(src/gsnap.c:4259-4430, src/path-learn.c)."""
import numpy as np
import pytest

from tpumap.gsnap.twopass import (analyze_insertlengths, junctions_from_sam,
                                  learn_knownsplicing, two_pass_align)
from tpumap.io.sam import SamRecord

# the intron is larger than the localscan salvage window (32768), so only
# a LEARNED junction can rescue the short-anchor read in pass 2
E1, E2, EXLEN = 5000, 60000, 50


class _FakeDB:
    chrom_names = ["chr1", "chr2"]
    chrom_offsets = np.asarray([0, 30000, 60000], dtype=np.uint64)


def test_junctions_from_sam():
    recs = [
        SamRecord("a", 0, "chr1", 101, 30, "50M200N50M",
                  tags=["XS:A:+"]),
        SamRecord("b", 16, "chr1", 101, 30, "50M200N50M",
                  tags=["XS:A:+"]),
        SamRecord("c", 0, "chr2", 11, 30, "10M5D20M100N70M",
                  tags=["XS:A:-"]),
        SamRecord("d", 4),                      # unmapped: ignored
        SamRecord("e", 0, "chr1", 500, 30, "100M"),   # no junction
    ]
    donors, acceptors, senses, counts = junctions_from_sam(_FakeDB(), recs)
    # a/b: junction at univcoord 100+50=150 .. 350 (x2); c: pos 10 + 10M
    # + 5D + 20M = 30045 .. 30145 on chr2 (offset 30000)
    assert list(donors) == [150, 30045]
    assert list(acceptors) == [350, 30145]
    assert list(senses) == [1, -1]
    assert list(counts) == [2, 1]

    # min_support filters singletons
    d2, a2, _s2, c2 = junctions_from_sam(_FakeDB(), recs, min_support=2)
    assert list(d2) == [150] and list(c2) == [2]


def test_learn_knownsplicing_senses():
    recs = [SamRecord("a", 0, "chr1", 101, 30, "50M200N50M",
                      tags=["XS:A:-"])]
    ks = learn_knownsplicing(_FakeDB(), recs)
    assert list(ks.antiacceptor) == [150]
    assert list(ks.antidonor) == [350]
    assert len(ks.donor) == 0


def test_analyze_insertlengths():
    recs = [SamRecord("a", 99, "chr1", 1, 30, "100M", tlen=300),
            SamRecord("a", 147, "chr1", 201, 30, "100M", tlen=-300),
            SamRecord("b", 99, "chr1", 1, 30, "100M", tlen=500)]
    m = analyze_insertlengths(recs)
    assert m["mean"] == 400.0
    assert m["pairmax"] > 500


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("tp")
    rng = np.random.default_rng(7)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 80000))
    # same ambiguous-junction construction as test_knownsplicing: without
    # knowledge the tie resolves to the wrong boundary
    g[E2 - 1] = g[E1 + EXLEN - 1]
    g[E1 + EXLEN] = "A"
    g[E1 + EXLEN + 1] = "A"
    g[E2 - 3] = "T"
    g[E2 - 2] = "T"
    seq = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="tp", k=13, interval=3)
    return db, DeviceIndex.from_host(db), seq


def test_two_pass_rescues_short_anchor(world, tmp_path):
    """A junction learned from well-anchored reads in pass 1 rescues a
    read whose second exon anchor (12 bp < k) cannot seed at all — the
    partner diagonal is DERIVED from the known junction
    (KnownSplicing.derived_pairs, the reference's partner lookup)."""
    from tpumap.gsnap.driver import align_records
    from tpumap.io.fasta import Record

    db, index, seq = world
    intron = E2 - E1 - EXLEN
    r_teach = Record("t", "", seq[E1 + 10:E1 + EXLEN] + seq[E2:E2 + 60])
    r_short = Record("s", "", seq[E1 + 12:E1 + EXLEN] + seq[E2:E2 + 12])

    # pass 1 alone cannot place r_short: its 12 bp second anchor is
    # shorter than k=13, so no second diagonal exists
    alone = align_records(db, index, [r_short], novelsplicing=True,
                          batch_size=64)
    assert "N" not in alone[0].cigar

    out, ks = two_pass_align(db, index, [r_teach, r_short], batch_size=64,
                             splices_dump=str(tmp_path / "sp"))
    by = {r.qname: r for r in out}
    assert len(ks.junctions) == 1
    j_left, j_right = int(ks.junctions[0][0]), int(ks.junctions[0][1])
    assert j_right - j_left == intron

    # both reads now carry the SAME junction interval
    for name in ("t", "s"):
        rec = by[name]
        assert f"{intron}N" in rec.cigar, rec
        prefix = int(rec.cigar.split("M")[0])
        assert rec.pos - 1 + prefix == j_left
    assert "NM:i:0" in by["s"].tags

    # dump/read round trip drives the same rescue through --splices-read
    from tpumap.gsnap.knownsplicing import KnownSplicing
    ks2 = KnownSplicing.load(str(tmp_path / "sp.npz"))
    out2 = align_records(db, index, [r_short], known=ks2, batch_size=64)
    assert f"{intron}N" in out2[0].cigar


def test_known_indels_learn_dump_load(tmp_path):
    """KnownIndels: CIGAR harvesting, persistence, site queries."""
    from tpumap.gsnap.knownindels import KnownIndels
    from tpumap.io.sam import SamRecord

    recs = [
        SamRecord("a", 0, "chr1", 101, 40, "50M3D50M"),
        SamRecord("b", 0, "chr1", 96, 40, "55M3D45M"),
        SamRecord("c", 0, "chr1", 300, 40, "20M2I78M"),
        SamRecord("d", 4, "*", 0, 0, "*"),
    ]
    ki = KnownIndels.from_sam(_FakeDB(), recs, min_support=1)
    assert ki.nsites == 2                    # del@150 (support 2), ins@319
    assert ki.any_in(150, 151)
    assert ki.near(151, slop=3)
    assert not ki.any_in(200, 300)
    ki2 = KnownIndels.from_sam(_FakeDB(), recs, min_support=2)
    assert ki2.nsites == 1                   # only the shared deletion
    p = tmp_path / "indels"
    ki.dump(str(p))
    back = KnownIndels.load(str(p))
    assert back.nsites == ki.nsites
    assert (back.coords == ki.coords).all()


def test_known_indels_lower_trigger(tmp_path):
    """A read with a small end-proximal deletion (too few mismatches to
    trigger DP, end run too short for the default endlength) is rescued
    when the site is known (--indels-read semantics)."""
    import numpy as np
    from tpumap.gsnap.driver import align_records
    from tpumap.gsnap.knownindels import KnownIndels
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record

    rng = np.random.default_rng(83)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    gfa = tmp_path / "g.fa"
    gfa.write_text(">chr1\n" + seq + "\n")
    db = build_db(gfa, name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    # position chosen so all 3 post-deletion bases mismatch: 3
    # substitution mismatches is below the DP trigger (4) and the 3-base
    # end run is below --indel-endlength (4) — only the known-site path
    # can produce the deletion call
    p = 1500
    # deletion of 3 bases after 97 read bases: at most 3 trailing
    # mismatches -> below the DP trigger, and a 3-base end run is below
    # the default --indel-endlength
    read = seq[p:p + 97] + seq[p + 100:p + 103]
    rec = Record("kd", "", read)
    plain = align_records(db, index, [rec])
    assert "3D" not in plain[0].cigar
    ki = KnownIndels(np.array([p + 97], np.uint64),
                     np.array([-3], np.int32), np.array([5], np.int64))
    rescued = align_records(db, index, [rec], known_indels=ki)
    # the DP may slide the deletion left through matching context
    # (94M3D6M is score-equivalent to 97M3D3M)
    assert "3D" in rescued[0].cigar
