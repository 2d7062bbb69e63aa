"""GMAP stage 1: candidate genomic region finding against a genome db.

Capability analog of src/stage1.c Stage1_compute: sample the query's
k-mers against the genome k-mer index and cluster the hit diagonals into
candidate genomic regions (Gregion equivalents). Exons of one gene sit on
increasing diagonals (separated by intron lengths), so clustering uses a
large merge slop (max total intron span) — the existing sort-based
prevalent-diagonal kernel with slop does exactly this.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpumap.index.device import DeviceIndex
from tpumap.ops import pack, seed
from tpumap.utils import dna


@dataclass(frozen=True)
class Stage1Config:
    # Query oligo sampling stride for region finding. MUST be coprime with
    # the genome index sampling interval (default 3): a stride that is a
    # multiple of it only ever probes ONE genome-position residue class, so
    # a region whose start falls in another class gets zero hits (the
    # reference scans all query oligos to avoid this, src/stage1.c:1595).
    # 5 cycles through all residues of 3 while sampling ~1/5 of oligos.
    sample_interval: int = 5
    max_occ: int = 16             # overabundant-oligo cap
    top_regions: int = 5
    # cluster slop ~ max gene span (gmap --totallength role). Also the
    # upper bound on how much junk a slop-merge can staple to a real gene
    # cluster, which sets the chain-stage padding cost — 200k matches the
    # default max intron length
    maxtotallen: int = 200_000
    region_pad: int = 2_000
    # repetitive-region fallback: keep first-max_occ hits of
    # overabundant oligos instead of dropping them
    keep_overabundant: bool = False
    # gmap --mode: seed in the reduced base space against the matching
    # mode-transformed index (requires a db built with tpumap-cmetindex /
    # tpumap-atoiindex; src/gmap.c:581 + src/cmetindex.c role)
    mode: str = "standard"


@partial(jax.jit, static_argnums=(4, 5))
def _region_diags(index, codes, nmask, lengths, config: Stage1Config,
                  space: str | None = None):
    if space is not None:
        from tpumap.ops.mode import CODE_MAPS
        codes = jnp.take(jnp.asarray(CODE_MAPS[space]),
                         codes.astype(jnp.int32))
    offsets, positions = index.mode_index(space)
    oligos, valid = seed.query_oligos(codes, nmask, lengths, index.k)
    NQ = oligos.shape[1]
    qpos = jnp.arange(0, NQ, config.sample_interval, dtype=jnp.int32)
    diags = seed.lookup_diagonals(offsets, positions,
                                  oligos[:, ::config.sample_interval],
                                  valid[:, ::config.sample_interval],
                                  qpos, config.max_occ,
                                  keep_overabundant=config.keep_overabundant)
    B = diags.shape[0]
    return seed.prevalent_diagonals(diags.reshape(B, -1),
                                    config.top_regions,
                                    merge_slop=config.maxtotallen,
                                    return_last=True)


def find_regions_bulk(index: DeviceIndex, queries: list,
                      config: Stage1Config = Stage1Config()):
    """Candidate regions for MANY queries in one device call.

    queries: list of (codes, nmask). Returns a list (parallel to queries)
    of region lists as in find_regions.
    """
    Nq = len(queries)
    Q = max(len(c) for c, _ in queries)
    Qp = 256
    while Qp < Q:
        Qp *= 2
    qc = np.zeros((2 * Nq, Qp), np.uint8)
    qn = np.zeros((2 * Nq, Qp), bool)
    lengths = np.zeros(2 * Nq, np.int32)
    for i, (codes, nmask) in enumerate(queries):
        L = len(codes)
        qc[2 * i, :L] = codes
        qn[2 * i, :L] = nmask
        qc[2 * i + 1, :L] = dna.revcomp_codes(codes)
        qn[2 * i + 1, :L] = nmask[::-1]
        lengths[2 * i] = lengths[2 * i + 1] = L
    from tpumap.ops.mode import MODE_SPACES
    spaces = MODE_SPACES[config.mode]
    if spaces == (None, None):
        diags, counts, lasts = _region_diags(index, jnp.asarray(qc),
                                             jnp.asarray(qn),
                                             jnp.asarray(lengths), config)
        diags, counts, lasts = (np.asarray(diags), np.asarray(counts),
                                np.asarray(lasts))
    else:
        # fwd rows (2i) and rc rows (2i+1) seed in different spaces
        # against different mode indexes (metct/metga, a2iag/a2itc)
        K = config.top_regions
        diags = np.zeros((2 * Nq, K), np.uint32)
        counts = np.zeros((2 * Nq, K), np.int32)
        lasts = np.zeros((2 * Nq, K), np.uint32)
        for off, sp in ((0, spaces[0]), (1, spaces[1])):
            d, c, l = _region_diags(index, jnp.asarray(qc[off::2]),
                                    jnp.asarray(qn[off::2]),
                                    jnp.asarray(lengths[off::2]),
                                    config, sp)
            diags[off::2] = np.asarray(d)
            counts[off::2] = np.asarray(c)
            lasts[off::2] = np.asarray(l)
    out = []
    for i, (codes, _n) in enumerate(queries):
        out.append(_regions_from_rows(index, diags[2 * i:2 * i + 2],
                                      counts[2 * i:2 * i + 2],
                                      lasts[2 * i:2 * i + 2],
                                      len(codes), config))
    return out


def find_regions(index: DeviceIndex, query_codes: np.ndarray,
                 query_nmask: np.ndarray,
                 config: Stage1Config = Stage1Config()):
    """Candidate regions for ONE query (both orientations).

    Returns list of (gstart, gend, weight, strand) sorted by weight desc.
    gstart/gend are univcoords clipped to the genome.
    """
    return find_regions_bulk(index, [(query_codes, query_nmask)],
                             config)[0]


def _regions_from_rows(index, diags, counts, lasts, Q,
                       config: Stage1Config):
    chrom_offsets = np.asarray(index.chrom_offsets, dtype=np.int64)
    regions = []
    spans = []
    for strand in (0, 1):
        for r in range(diags.shape[1]):
            if counts[strand, r] <= 1:
                continue
            d0, d1 = int(diags[strand, r]), int(lasts[strand, r])
            weight = int(counts[strand, r])
            # wide SPARSE clusters are slop-merged junk (a real gene
            # cluster's weight scales with its exon content): emit small
            # regions around the endpoint diagonals instead of one
            # megabase region that blows up the chain-stage padding
            if d1 - d0 > 4 * Q + 20_000 and weight <= 8:
                spans.append((d0, d0, weight, strand))
                spans.append((d1, d1, weight, strand))
            elif d1 - d0 > config.maxtotallen:
                # dense WIDE train (genome-wide repeat family chained
                # through the slop): a real gene still fits in
                # maxtotallen (gmap --totallength bound), so emit
                # endpoint windows of that size instead of one
                # multi-megabase region
                spans.append((d0, min(d0 + config.maxtotallen, d1),
                              weight, strand))
                spans.append((max(d1 - config.maxtotallen, d0), d1,
                              weight, strand))
            else:
                spans.append((d0, d1, weight, strand))
    for (d0, d1, weight, strand) in spans:
            gstart = max(d0 - config.region_pad, 0)
            gend = min(d1 + Q + config.region_pad, index.genome_length)
            # a gene region never crosses a chromosome boundary: split
            # clusters that span one (the diagonal-merge slop can join
            # loci on different chromosomes of a small genome)
            lo = gstart
            while lo < gend:
                c = int(np.searchsorted(chrom_offsets, lo,
                                        side="right")) - 1
                chrom_end = int(chrom_offsets[c + 1])
                hi = min(gend, chrom_end)
                regions.append((lo, hi, weight, strand))
                lo = hi
    regions.sort(key=lambda t: -t[2])
    return regions[:config.top_regions]
