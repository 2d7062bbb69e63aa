"""gmap --mode cmet/atoi (src/gmap.c:581): spliced alignment of
base-converted cDNA in the reduced base space, with splice dinucleotides
and MaxEnt probabilities still evaluated on the original bases."""
import numpy as np

from tpumap.gmap.engine import GmapConfig, align_cdna_both
from tpumap.utils import dna


def _world(seed):
    rng = np.random.default_rng(seed)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    # strong splice consensus so the true boundary dominates the bridge
    # scoring even in reduced base spaces (see test_gmap_stage3)
    g = (g[:1197] + "CAGGTAAGT" + g[1206:2985] + "T" * 13 + "AGG"
         + g[3001:])
    e1, e2 = g[1000:1200], g[3000:3200]
    return g, e1 + e2


def test_cmet_plus():
    g, q = _world(21)
    q_bis = q.replace("C", "T")             # bisulfite-converted cDNA
    qc, qn = dna.encode(q_bis)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn,
                          GmapConfig(mode="cmet-stranded"))
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert spans == [(1000, 1200), (3000, 3200)], spans
    assert res.mismatches == 0              # counted in ct space
    assert res.strand == 0
    assert [i.canonical for i in res.introns] == ["GT-AG"]


def test_cmet_minus():
    g, q = _world(22)
    # conversion happens on the sequenced molecule: the minus-strand read
    # is revcomp FIRST, then C->T (matches gsnap's metct/metga pairing)
    q_bis = dna.revcomp(q).replace("C", "T")
    qc, qn = dna.encode(q_bis)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn,
                          GmapConfig(mode="cmet-stranded"))
    assert res.strand == 1
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert spans == [(1000, 1200), (3000, 3200)], spans
    assert res.mismatches == 0


def test_atoi_plus():
    g, q = _world(23)
    q_ed = q.replace("A", "G")              # A->I(G) RNA editing
    qc, qn = dna.encode(q_ed)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn,
                          GmapConfig(mode="atoi-stranded"))
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert spans == [(1000, 1200), (3000, 3200)], spans
    assert res.mismatches == 0


def test_standard_mode_rejects_converted_read():
    # the same bisulfite read in standard mode must NOT align cleanly
    g, q = _world(21)
    q_bis = q.replace("C", "T")
    qc, qn = dna.encode(q_bis)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn, GmapConfig())
    assert res is None or res.mismatches > 10 or res.coverage < len(q)
