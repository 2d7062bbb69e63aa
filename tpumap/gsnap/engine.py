"""GSNAP-style short-read alignment engine — batched cascade.

Replaces the reference's per-read method ladder (src/stage1hr-single.c:
Kmer_exact1 -> Extension_search -> Kmer_segment -> Kmer_prevalent, each
running only while found_score is insufficient) with a batched pipeline:
the whole `[B]` read batch flows through seed -> verify -> select under
masks; there are no per-read early exits, the cheap path IS the batch.

Round-1 scope: single-end, substitution-only alignments (the
KMER_EXACT1/PREVALENT + Genomebits_count equivalent). Indels, splices and
paired ends land on top of this skeleton.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpumap.index.device import DeviceIndex, INVALID_DIAG
from tpumap.ops import pack, seed, verify


@dataclass(frozen=True)
class AlignConfig:
    max_occ: int = 32          # per-oligo occurrence cap (overabundance)
    top_k: int = 8             # candidate diagonals per strand
    # Query oligos are sampled at EVERY position: with the genome index
    # sampled every `interval` bases, only 1-in-interval query offsets hit an
    # indexed position for any given alignment start, so skipping query
    # positions can miss alignments entirely (the reference also reads all
    # query oligos, src/stage1hr.c).
    qinterval: int = 1
    max_mismatch_frac: float = 0.10   # unaligned if worse


@partial(jax.jit, static_argnums=(2,))
def align_batch(index: DeviceIndex, batch, config: AlignConfig):
    """Align a read batch; returns per-read best hit info (device arrays).

    batch: dict with codes uint8[B, L], nmask bool[B, L], lengths int32[B].
    Returns dict: diag uint32[B] (univdiagonal of query base 0 on plus
    strand of the aligned read orientation), strand int32[B] (0 fwd/1 rc),
    nmismatch int32[B], second_nmismatch int32[B], mapped bool[B],
    n_best int32[B] (count of co-optimal candidates seen).
    """
    codes, nmask, lengths = batch["codes"], batch["nmask"], batch["lengths"]
    B, L = codes.shape

    rc_codes = pack.revcomp_codes(codes, lengths)
    # reverse the N flags via the same gather (N -> code 0 -> revcomp 3;
    # normal and padding positions end up 0)
    rc_nmask = pack.revcomp_codes(jnp.where(nmask, jnp.uint8(0), jnp.uint8(3)),
                                  lengths) == jnp.uint8(3)

    def one_strand(c, m):
        packed = pack.pack_reads(c)
        nmask2 = pack.pack_reads(m.astype(jnp.uint8))
        diags, _counts = seed.seed_reads(index, c, m, lengths,
                                         max_occ=config.max_occ,
                                         top_k=config.top_k,
                                         qinterval=config.qinterval)
        nmm = verify.verify_diagonals(index, packed, nmask2, lengths, diags)
        return diags, nmm

    fdiags, fnmm = one_strand(codes, nmask)
    rdiags, rnmm = one_strand(rc_codes, rc_nmask)

    all_diags = jnp.concatenate([fdiags, rdiags], axis=1)
    all_nmm = jnp.concatenate([fnmm, rnmm], axis=1)
    K = fdiags.shape[1]
    strands = jnp.concatenate([jnp.zeros((B, K), jnp.int32),
                               jnp.ones((B, K), jnp.int32)], axis=1)
    return select_best(all_diags, all_nmm, strands, lengths, config)


def select_best(all_diags: jax.Array, all_nmm: jax.Array, strands: jax.Array,
                lengths: jax.Array, config: AlignConfig):
    """Rank candidates by mismatch count; emit best hit + MAPQ inputs."""
    B, K2 = all_diags.shape
    # mask duplicate candidates (same strand+diag) so n_best is meaningful
    sort_key = all_nmm * jnp.int32(2 ** 16) + jnp.arange(K2, dtype=jnp.int32)
    order = jnp.argsort(sort_key, axis=1)
    nmm_sorted = jnp.take_along_axis(all_nmm, order, axis=1)
    diag_sorted = jnp.take_along_axis(all_diags, order, axis=1)
    strand_sorted = jnp.take_along_axis(strands, order, axis=1)

    best_nmm = nmm_sorted[:, 0]
    best_diag = diag_sorted[:, 0]
    best_strand = strand_sorted[:, 0]

    is_best = nmm_sorted == best_nmm[:, None]
    dup = (diag_sorted == best_diag[:, None]) & (strand_sorted == best_strand[:, None])
    n_best = jnp.sum(is_best & ~dup, axis=1) + 1

    # second-best score among non-duplicate candidates
    second = jnp.where(dup, jnp.int32(2 ** 15), nmm_sorted)
    second_nmm = jnp.min(second, axis=1)

    max_nmm = (lengths.astype(jnp.float32) * config.max_mismatch_frac).astype(jnp.int32)
    mapped = (best_diag != INVALID_DIAG) & (best_nmm <= max_nmm)

    return {
        "diag": best_diag,
        "strand": best_strand,
        "nmismatch": best_nmm,
        "second_nmismatch": second_nmm,
        "n_best": n_best,
        "mapped": mapped,
    }


@partial(jax.jit, static_argnums=(4, 5))
def refine_indels(index, codes: jax.Array, lengths: jax.Array,
                  diags: jax.Array, band: int, margin: int = 8):
    """Banded-DP refinement around candidate diagonals (indel discovery).

    codes must be in the ALIGNED orientation (driver passes rc codes for
    strand-1 reads). The genome window starts `margin` bases before the
    diagonal so alignments whose true start precedes the seed diagonal
    (reads with leading insertions) stay in band; net deletions up to
    (band - margin) and insertions up to (band + margin) are reachable.

    Returns dict: score int32[B], ops uint8[B, S] (reverse transcripts),
    start_off int32[B] (alignment genome start relative to diag).
    """
    from tpumap.ops import dp

    B, L = codes.shape
    gstart = jnp.maximum(diags, jnp.uint32(margin)) - jnp.uint32(margin)
    W = L + band + margin
    gcodes = verify.extract_codes_window(index.genome_packed, gstart, W)
    glens = jnp.minimum(
        jnp.int32(W),
        (jnp.uint32(index.genome_length) - gstart).astype(jnp.int32))
    out = dp.banded_align(codes, lengths, gcodes, glens, band, mode="glocal")
    ops, k_final = dp.traceback(out["dirs"], lengths, out["end_k"], band)
    start_off = (k_final - band).astype(jnp.int32) + (
        gstart.astype(jnp.int32) - diags.astype(jnp.int32))
    return {"score": out["score"], "ops": ops, "start_off": start_off}


def mapq_from_scores(nmm: np.ndarray, second: np.ndarray, n_best: np.ndarray,
                     lengths: np.ndarray) -> np.ndarray:
    """Simple MAPQ model: gap to the second-best alignment, capped at 40.

    (The reference's quality-weighted log-likelihood model, src/mapq.c, is a
    later milestone; this preserves the key semantics: 0 for multimappers.)
    """
    gap = np.clip(second - nmm, 0, 10)
    mapq = np.where(n_best > 1, 0, 10 + 3 * gap)
    return np.clip(mapq, 0, 40).astype(np.int32)
