"""Fusion/translocation split reads (src/path-fusion.c capability):
cross-chromosome and distant same-orientation two-piece alignments emitted
as primary + supplementary SAM records with SA tags."""
import numpy as np
import pytest

from tpumap.io.fasta import Record


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("fus")
    rng = np.random.default_rng(13)
    c1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 15000))
    c2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 15000))
    (d / "g.fa").write_text(f">chr1\n{c1}\n>chr2\n{c2}\n")
    db = build_db(d / "g.fa", name="fus", k=13, interval=3)
    # pick a breakpoint with no microhomology so the boundary is unique:
    # the last chr1 base must differ from the chr2 base under it, and the
    # first chr2 base from the chr1 base under it
    p2 = 7000
    while c1[4059] == c2[p2 - 1] or c2[p2] == c1[4060]:
        p2 += 1
    return db, DeviceIndex.from_host(db), c1, c2, p2


def test_cross_chromosome_fusion(world):
    from tpumap.gsnap.driver import align_records

    db, index, c1, c2, p2 = world
    # 60 bp from chr1 + 40 bp from chr2 = a translocation read
    read = c1[4000:4060] + c2[p2:p2 + 40]
    out = align_records(db, index, [Record("f1", "", read)],
                        find_fusions=True)
    assert len(out) == 2
    prim = [r for r in out if not r.flag & 0x800]
    supp = [r for r in out if r.flag & 0x800]
    assert len(prim) == 1 and len(supp) == 1
    assert prim[0].rname == "chr1" and prim[0].pos == 4001
    assert prim[0].cigar == "60M40S"
    assert supp[0].rname == "chr2" and supp[0].pos == p2 + 1
    assert supp[0].cigar == "60S40M"
    assert any(t.startswith(f"SA:Z:chr2,{p2 + 1},+,") for t in prim[0].tags)
    assert any(t.startswith("SA:Z:chr1,4001,+,") for t in supp[0].tags)


def test_fusion_on_reverse_strand(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.utils import dna

    db, index, c1, c2, p2 = world
    read = dna.revcomp(c1[4000:4060] + c2[p2:p2 + 40])
    out = align_records(db, index, [Record("f2", "", read)],
                        find_fusions=True)
    assert len(out) == 2
    prim = [r for r in out if not r.flag & 0x800][0]
    assert prim.flag & 16
    assert prim.rname == "chr1" and prim.pos == 4001


def test_no_fusion_without_flag(world):
    from tpumap.gsnap.driver import align_records

    db, index, c1, c2, p2 = world
    read = c1[4000:4060] + c2[p2:p2 + 40]
    out = align_records(db, index, [Record("f3", "", read)])
    assert len(out) == 1     # no supplementary record emitted


def test_ordinary_read_not_fused(world):
    from tpumap.gsnap.driver import align_records

    db, index, c1, c2, p2 = world
    out = align_records(db, index, [Record("n1", "", c1[2000:2100])],
                        find_fusions=True)
    assert len(out) == 1
    assert out[0].cigar == "100M"


def _mlen(cigar):
    import re
    return sum(int(n) for n, op in re.findall(r"(\d+)([MIDNS])", cigar)
               if op == "M")


def test_inverted_fusion_fwd_first(world):
    """Cross-strand (inversion) fusion (src/path-fusion.c inversion
    joins): read prefix forward on chr1, suffix reverse-complemented.
    The exact breakpoint may shift by microhomology (a chance match at
    the boundary) — assertions check the anchored ends + structure."""
    from tpumap.gsnap.driver import align_records
    from tpumap.utils import dna

    db, index, c1, c2, p2 = world
    read = c1[5000:5050] + dna.revcomp(c1[8000:8050])
    out = align_records(db, index, [Record("i1", "", read)],
                        find_fusions=True)
    assert len(out) == 2
    prim = [r for r in out if not r.flag & 0x800][0]
    supp = [r for r in out if r.flag & 0x800][0]
    fwd = prim if not prim.flag & 16 else supp
    rev = supp if fwd is prim else prim
    assert not fwd.flag & 16 and rev.flag & 16
    # both pieces are LEFT-anchored (prefix piece at 5001, rc-prefix at
    # 8001); the M split covers the whole read
    assert fwd.pos == 5001 and fwd.cigar.startswith(f"{_mlen(fwd.cigar)}M")
    assert rev.pos == 8001 and rev.cigar.startswith(f"{_mlen(rev.cigar)}M")
    assert _mlen(fwd.cigar) + _mlen(rev.cigar) == 100
    assert abs(_mlen(fwd.cigar) - 50) <= 3
    assert rev.seq == dna.revcomp(read)
    assert any(t.startswith("SA:Z:chr1,8001,-,") for t in fwd.tags)
    assert any(t.startswith("SA:Z:chr1,5001,+,") for t in rev.tags)
    assert "NM:i:0" in fwd.tags and "NM:i:0" in rev.tags


def test_inverted_fusion_rc_first(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.utils import dna

    db, index, c1, c2, p2 = world
    read = dna.revcomp(c1[8000:8050]) + c1[5000:5050]
    out = align_records(db, index, [Record("i2", "", read)],
                        find_fusions=True)
    assert len(out) == 2
    fwd = [r for r in out if not r.flag & 16][0]
    rev = [r for r in out if r.flag & 16][0]
    # both pieces are RIGHT-anchored: their M spans END at 5050 / 8050
    assert fwd.pos + _mlen(fwd.cigar) - 1 == 5050
    assert rev.pos + _mlen(rev.cigar) - 1 == 8050
    assert _mlen(fwd.cigar) + _mlen(rev.cigar) == 100
    assert abs(_mlen(fwd.cigar) - 50) <= 3
    assert "NM:i:0" in fwd.tags and "NM:i:0" in rev.tags
