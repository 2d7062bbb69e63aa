"""GMAP-style mate repair (the src/repair.c / Pathpair_resolve role).

A spliced mate whose sequence is entirely repetitive has every seed
suppressed by the overabundance cap, and the substitution-only window
rescue (LOCAL_MATE) fails on the junction.  The repair stage locates the
mate's end/middle fragments inside the insert window with the
localdb-style scan and hands the diagonals to the chain-DP solver, so
the mate comes back as a spliced record at the window-concordant copy.
"""
import numpy as np
import pytest

from tpumap.gsnap.engine import AlignConfig
from tpumap.gsnap.paired import align_paired_records
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record
from tpumap.utils import dna as dna_mod


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("repair")
    rng = np.random.default_rng(17)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 80000))
    # 400 bp repeat unit with a planted GT..AG intron [60, 260)
    ru = list("ACGT"[i] for i in rng.integers(0, 4, 400))
    ru[60:62] = list("GT")
    ru[258:260] = list("AG")
    # 40 decoy copies far from the anchor + ONE copy in the mate window
    for j in range(40):
        g[j * 1000:j * 1000 + 400] = ru
    g[75200:75600] = ru
    genome = "".join(g)
    (root / "g.fa").write_text(">chr1\n" + genome + "\n")
    db = build_db(root / "g.fa", name="rep", k=13, interval=3)
    return db, DeviceIndex.from_host(db), genome


def test_spliced_repetitive_mate_repaired(world):
    db, index, genome = world
    r1 = Record("p", "", genome[75000:75100])                 # unique anchor
    spliced = genome[75200:75260] + genome[75460:75500]       # 60M200N40M
    r2 = Record("p", "", dna_mod.revcomp(spliced))
    r1s, r2s = align_paired_records(
        db, index, [(r1, r2)], AlignConfig(), novelsplicing=True,
        max_intron=10_000)[0]
    assert not r1s.flag & 4 and not r2s.flag & 4
    assert r2s.pos == 75201, (r2s.pos, r2s.cigar)
    assert r2s.cigar == "60M200N40M", r2s.cigar
    # the anchor's mate pointers reflect the repaired placement
    assert r1s.pnext == 75201
    assert not r1s.flag & 0x8


def test_unrepairable_mate_stays_unmapped(world):
    """A mate with no placement in the window stays unmapped (repair
    must not invent alignments)."""
    db, index, genome = world
    rng = np.random.default_rng(5)
    junk = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    r1 = Record("q", "", genome[75000:75100])
    r2 = Record("q", "", junk)
    r1s, r2s = align_paired_records(
        db, index, [(r1, r2)], AlignConfig(), novelsplicing=True,
        max_intron=10_000)[0]
    assert not r1s.flag & 4
    assert r2s.flag & 4


def test_resolve_inner_dovetail(world):
    """--resolve-inner (default on, src/pathpair-eval.c:410): reads that
    extend past the mate's distal fragment boundary get the overhang
    soft-clipped and TLEN shrinks to the fragment."""
    db, index, genome = world
    r1 = Record("d", "", genome[60000:60100])
    r2 = Record("d", "", dna_mod.revcomp(genome[59980:60080]))
    r1s, r2s = align_paired_records(
        db, index, [(r1, r2)], AlignConfig())[0]
    assert r1s.cigar == "80M20S", r1s.cigar
    assert r2s.cigar == "20S80M", r2s.cigar
    assert r2s.pos == 60001
    assert abs(r1s.tlen) == 80 and r1s.flag & 2


def test_resolve_inner_off(world):
    """--resolve-inner=0 keeps full-length alignments."""
    db, index, genome = world
    r1 = Record("d", "", genome[60000:60100])
    r2 = Record("d", "", dna_mod.revcomp(genome[59980:60080]))
    r1s, r2s = align_paired_records(
        db, index, [(r1, r2)], AlignConfig(), resolve_inner=False)[0]
    assert r1s.cigar == "100M" and r2s.cigar == "100M"
