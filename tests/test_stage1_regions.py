"""Adversarial slop-merge cases for GMAP stage 1 (VERDICT r1 weak #9).

The reference clusters stage-1 hits into gregions by genomic proximity
(src/stage1.c); prevalent_diagonals re-expresses that with
chained-neighbor slop merging over sorted diagonals.  These tests probe
the adversarial shapes: hit trains LONGER than one slop window (must
stay one cluster — support must not split), and dense genome-wide
repeat trains (must not become one multi-megabase region).
"""
import numpy as np
import pytest

from tpumap.gmap.stage1 import Stage1Config, find_regions
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.ops import seed
from tpumap.utils import dna


def test_train_longer_than_slop_is_one_run():
    """A train of diagonals each within slop of its predecessor merges
    into ONE run even when the train's total extent exceeds the slop
    (support is NOT split at slop-window boundaries)."""
    import jax.numpy as jnp

    train = np.arange(0, 1100, 100, dtype=np.uint32)      # extent 1000
    pad = np.full(5, seed.INVALID, dtype=np.uint32)
    d = jnp.asarray(np.concatenate([train, pad])[None, :])
    diags, counts, lasts = seed.prevalent_diagonals(
        d, 3, merge_slop=150, return_last=True)
    assert int(counts[0, 0]) == len(train)
    assert int(diags[0, 0]) == 0 and int(lasts[0, 0]) == 1000
    assert int(counts[0, 1]) == 0      # nothing was split off


@pytest.fixture(scope="module")
def repeat_world(tmp_path_factory):
    """200 kb genome with (a) a 6-exon gene spread over ~20 kb and (b) a
    60 bp repeat planted every 4 kb across 160 kb."""
    root = tmp_path_factory.mktemp("s1adv")
    rng = np.random.default_rng(21)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 200_000))
    gene = "".join("ACGT"[i] for i in rng.integers(0, 4, 360))
    exon_pos = [5000 + 4000 * e for e in range(6)]        # span 20 kb
    for e, p in enumerate(exon_pos):
        g[p:p + 60] = list(gene[60 * e:60 * e + 60])
    rep = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    rep_pos = list(range(32_000, 192_000, 4000))          # extent 160 kb
    for p in rep_pos:
        g[p:p + 60] = list(rep)
    genome = "".join(g)
    fa = root / "g.fa"
    fa.write_text(">chr1\n" + genome + "\n")
    db = build_db(fa, name="s1adv", k=12, interval=3)
    return db, DeviceIndex.from_host(db), genome, gene, exon_pos, rep


def test_gene_train_support_not_split(repeat_world):
    """Exons spaced < slop apart whose TOTAL span exceeds the slop keep
    their combined k-mer support in ONE cluster (chained merging): the
    top region's weight counts hits from ALL exons, not just the exons
    inside one slop window.  (Its genomic extent is then capped to
    maxtotallen — the --totallength gene-span bound — with endpoint
    windows, so both the first and last exon stay reachable.)"""
    _db, index, _genome, gene, exon_pos, _rep = repeat_world
    qc, qn = dna.encode(gene)
    # slop 6000 exceeds the 4 kb exon spacing but is far below the
    # 20 kb train extent; per-exon hits at index interval 3 ~ 17, x6
    # exons ~ 100 total — a slop-window split would keep <= 2 exons (~34)
    cfg = Stage1Config(maxtotallen=6000, sample_interval=1)
    regions = find_regions(index, qc, qn, cfg)
    assert regions
    top_w = regions[0][2]
    assert top_w >= 90, regions
    assert any(gs <= exon_pos[0] < ge for gs, ge, _w, s in regions
               if s == 0), (regions, exon_pos)
    assert any(gs < exon_pos[-1] + 60 <= ge for gs, ge, _w, s in regions
               if s == 0), (regions, exon_pos)
    # a gene-sized slop keeps the whole gene in one region outright
    full = find_regions(index, qc, qn,
                        Stage1Config(maxtotallen=25_000,
                                     sample_interval=1))
    gstart, gend, _w, strand = full[0]
    assert strand == 0
    assert gstart <= exon_pos[0] and gend >= exon_pos[-1] + 60, (
        full[0], exon_pos)


def test_dense_repeat_train_is_capped(repeat_world):
    """A dense repeat train chained through the slop across 160 kb must
    NOT produce one 160 kb region: every emitted region is bounded by
    maxtotallen (+ query + pads), anchored at the train's endpoints."""
    _db, index, _genome, _gene, _exon_pos, rep = repeat_world
    qc, qn = dna.encode(rep)
    cfg = Stage1Config(maxtotallen=5000, sample_interval=1, max_occ=64)
    regions = find_regions(index, qc, qn, cfg)
    assert regions
    bound = 5000 + len(rep) + 2 * cfg.region_pad
    for gstart, gend, _w, _s in regions:
        assert gend - gstart <= bound, (gstart, gend)
    # endpoint anchoring: some region still covers the first repeat copy
    # and some region the last
    assert any(gs <= 32_000 < ge for gs, ge, _w, _s in regions), regions
    assert any(gs <= 188_000 + 60 <= ge for gs, ge, _w, _s in regions), (
        regions)
