"""Window-restricted fragment scan — the localdb salvage equivalent.

The reference builds per-65,536-bp suffix arrays (src/localdb-read.c,
src/sarray-write.c, SACA-K) to locate short query fragments that the
k-mer index cannot seed (fragments shorter than k, or split by a splice
site close to the read end); Spliceends_* consult it to find novel
splice-end diagonals (src/spliceends.c:5080, src/path-solve.c).

Suffix arrays gather-poorly on TPU. The same capability re-expressed
TPU-first: extract the bounded genomic window once (a strided gather of
W/16 words per read) and brute-force match the fragment at every offset
on the VPU — F*W byte-compares per read, which at localdb scale
(W = 32 Kbp, F <= 16) is microseconds of vector work. Only reads the
cascade failed to solve reach this op, batch-compacted.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpumap.ops import verify

INVALID = np.uint32(0xFFFFFFFF)


@partial(jax.jit, static_argnums=(4, 5, 6))
def scan_fragment(genome_packed: jax.Array, win_starts: jax.Array,
                  frag: jax.Array, frag_lens: jax.Array,
                  window: int, max_frag: int, top_k: int = 4):
    """Find the best placements of per-read fragments inside genome
    windows.

    genome_packed: uint32[...] packed genome; win_starts: uint32[R]
    window start univcoords; frag: uint8[R, max_frag] fragment codes;
    frag_lens: int32[R] actual fragment lengths (<= max_frag).

    Returns (positions uint32[R, top_k], nmm int32[R, top_k]): genome
    univcoords of the fragment's first base at the top_k
    lowest-mismatch offsets, INVALID-padded.
    """
    R = win_starts.shape[0]
    wcodes = verify.extract_codes_window(genome_packed, win_starts,
                                         window + max_frag)
    mm = jnp.zeros((R, window), dtype=jnp.int32)
    for j in range(max_frag):
        in_frag = (j < frag_lens)[:, None]
        diff = wcodes[:, j:j + window] != frag[:, j, None]
        mm = mm + jnp.where(in_frag, diff.astype(jnp.int32), 0)
    neg, idx = jax.lax.top_k(-mm, top_k)
    best_mm = -neg
    positions = win_starts[:, None] + idx.astype(jnp.uint32)
    return positions, best_mm


@partial(jax.jit, static_argnums=(4, 5, 6))
def scan_exact_sites(genome_packed: jax.Array, win_starts: jax.Array,
                     frag: jax.Array, frag_lens: jax.Array,
                     window: int, max_frag: int, top_k: int = 8):
    """ALL exact placements of per-read patterns inside genome windows.

    The ambiguous-splice-end enumerator (src/spliceends.c trimmed-end
    candidate generation + src/altsplice.c coords): the pattern is a
    splice dinucleotide fused with the read's short clipped residue, and
    every exact match in the intron-length window is a legal distal
    placement.  Same VPU brute-force shape as scan_fragment, but exact
    matches only, returned in ascending genomic order WITH the total
    match count (the ambiguity degree).

    Returns (positions uint32[R, top_k] INVALID-padded ascending,
    count int32[R]).  Rows with frag_lens <= 0 return count 0.
    """
    R = win_starts.shape[0]
    wcodes = verify.extract_codes_window(genome_packed, win_starts,
                                         window + max_frag)
    mm = jnp.zeros((R, window), dtype=jnp.int32)
    for j in range(max_frag):
        in_frag = (j < frag_lens)[:, None]
        diff = wcodes[:, j:j + window] != frag[:, j, None]
        mm = mm + jnp.where(in_frag, diff.astype(jnp.int32), 0)
    hit = (mm == 0) & (frag_lens > 0)[:, None]
    count = jnp.sum(hit.astype(jnp.int32), axis=1)
    off = jnp.arange(window, dtype=jnp.int32)[None, :]
    key = jnp.where(hit, off, jnp.int32(window))
    firstk = -jax.lax.top_k(-key, top_k)[0]        # k smallest offsets
    positions = jnp.where(firstk < window,
                          win_starts[:, None] + firstk.astype(jnp.uint32),
                          INVALID)
    return positions, count
