"""GMAP stage-3 completion: microexons / dual introns / smoothing.

The reference fills mismatch-heavy or noncanonical single-intron bridges
with a canonical microexon when the gap can hold two introns
(src/stage3.c traverse_genome_gap -> Dynprog_microexon_int,
src/dynprog_single.c:900-1181), after Smooth_pairs zaps chance-level
internal exons (src/smooth.c). These tests drive tpumap's re-expression
(tpumap/gmap/engine.py _find_microexon / _zap_chance_exons).
"""
import numpy as np

from tpumap.gmap.engine import GmapConfig, align_cdna, align_cdna_both
from tpumap.utils import dna


def _mutate(s: str, pos: int) -> str:
    return s[:pos] + "ACGT"[("ACGT".index(s[pos]) + 1) % 4] + s[pos + 1:]


def _genome_with_microexon(seed: int, micro: str, sense: bool = True):
    """exon1 [1000,1200) | intron | micro at 2000 | intron | exon2 [3000,3200).

    Sense gene: GT..AG around both introns; antisense: CT..AC.
    """
    rng = np.random.default_rng(seed)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 6000))
    ml = len(micro)
    d1, d2 = ("GT", "AG") if sense else ("CT", "AC")
    # intron 1: [1200, 2000)
    g[1200:1202] = list(d1)
    g[1998:2000] = list(d2)
    g[2000:2000 + ml] = list(micro)
    # intron 2: [2000+ml, 3000)
    g[2000 + ml:2002 + ml] = list(d1)
    g[2998:3000] = list(d2)
    return "".join(g)


def test_microexon_dual_intron_sense():
    micro = "TTACGGA"                      # 7 bp — too short to anchor
    g = _genome_with_microexon(11, micro)
    e1, e2 = g[1000:1200], g[3000:3200]
    assert g[2000:2007] == micro
    query = e1 + micro + e2
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna(qc, qn, gc_, gn, GmapConfig())
    spans = [(e.qstart, e.qend, e.gstart, e.gend) for e in res.exons]
    assert spans == [(0, 200, 1000, 1200), (200, 207, 2000, 2007),
                     (207, 407, 3000, 3200)], spans
    assert [i.kind for i in res.introns] == ["intron", "intron"]
    assert [i.canonical for i in res.introns] == ["GT-AG", "GT-AG"]
    assert res.mismatches == 0


def test_microexon_dual_intron_antisense():
    micro = "CATGACCT"                     # 8 bp
    g = _genome_with_microexon(12, micro, sense=False)
    e1, e2 = g[1000:1200], g[3000:3200]
    query = e1 + micro + e2
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna(qc, qn, gc_, gn, GmapConfig())
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert spans == [(1000, 1200), (2000, 2008), (3000, 3200)], spans
    assert [i.canonical for i in res.introns] == ["CT-AC", "CT-AC"]
    assert res.cdna_direction == -1


def test_no_false_microexon_on_clean_intron():
    # a clean canonical single intron must NOT grow a microexon
    rng = np.random.default_rng(13)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    e1, e2 = g[1000:1200], g[3000:3200]
    g = g[:1200] + "GT" + g[1202:2998] + "AG" + g[3000:]
    query = e1 + e2
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna(qc, qn, gc_, gn, GmapConfig())
    assert len(res.exons) == 2
    assert res.mismatches == 0


def test_zap_chance_internal_anchor():
    """A spurious 8-bp internal anchor inside a long intron is removed
    (smooth.c chance-probability zap) and the true 2-exon structure
    recovered."""
    rng = np.random.default_rng(14)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 40000))
    # strong consensus contexts so the true junction carries MaxEnt
    # support (random-dinucleotide "sites" lose the prob-weighted bridge
    # scoring to chance competitors, as in the reference)
    g[1197:1206] = list("CAGGTAAGT")        # donor: CAG|GTAAGT
    g[29985:30001] = list("T" * 13 + "AGG")  # acceptor: ...TTT...AG|G
    g = "".join(g)
    e1, e2 = g[1000:1200], g[30000:30200]
    query = e1 + e2
    # plant an 8-bp copy of the query around the junction deep inside the
    # intron so the chain stage can pick up a chance internal anchor on a
    # third diagonal (4^8 < 4 * intron span -> zapped)
    g = g[:15000] + query[197:205] + g[15008:]
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna(qc, qn, gc_, gn, GmapConfig())
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert (1000, 1200) in spans and (30000, 30200) in spans
    assert all(e.gend - e.gstart >= 100 for e in res.exons), spans


def test_indel_cdna_structure():
    """An indel-containing cDNA reproduces the exon/indel structure
    (stage3 build_pairs_singles role): a deletion and an insertion inside
    exons become 'deletion'/'insertion' junction entries at the right
    coordinates."""
    rng = np.random.default_rng(15)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    # query = g[1000:1400) with a 3 bp deletion (genome bases 1200-1202
    # missing from the query) and a 4 bp insertion after genome 1299
    query = g[1000:1200] + g[1203:1300] + "ACGT" + g[1300:1400]
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna(qc, qn, gc_, gn, GmapConfig())
    kinds = [(i.kind, i.length) for i in res.introns]
    assert ("deletion", 3) in kinds, kinds
    assert ("insertion", 4) in kinds, kinds
    spans = [(e.qstart, e.qend, e.gstart, e.gend) for e in res.exons]
    assert spans[0] == (0, 200, 1000, 1200), spans
    assert res.exons[-1].gend == 1400
    assert res.mismatches == 0


def test_100kbp_query():
    """The reference accepts <=100 kbp queries (src/gmap.c:113); the
    chain stage's n_segments scaling must hold at that bound."""
    from tpumap.gmap.engine import align_cdna_pairs

    rng = np.random.default_rng(16)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 400_000))
    # 25 exons x 4000 bp = 100 kbp query over a ~375 kb region
    exons = []
    pos = 5000
    glist = list(g)
    for e in range(25):
        exons.append((pos, pos + 4000))
        if e < 24:
            nxt = pos + 4000 + int(rng.integers(5000, 12000))
            glist[pos + 4000:pos + 4002] = list("GT")
            glist[nxt - 2:nxt] = list("AG")
            pos = nxt
    g = "".join(glist)
    query = "".join(g[a:b] for a, b in exons)
    assert len(query) == 100_000
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna_pairs([(qc, qn, gc_, gn, 0, 0)])[0]
    assert res is not None
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert len(spans) == 25, len(spans)
    assert spans == [(a, b) for a, b in exons], spans[:3]
    assert res.mismatches == 0
    assert all(i.kind == "intron" for i in res.introns)
