"""Batched 2-bit read packing (device op).

The reference compresses each query once per read into fwd+rc 2-bit blocks
(src/compress.c, Compress_new_fwd/rev) on the CPU; here a whole read batch
is packed on device as one vectorized op. Layout matches the genome packing
(16 bases per uint32, base i at bits 2*(i%16)) so verification is XOR.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BASES_PER_WORD = 16


def words_for(length: int) -> int:
    return (length + BASES_PER_WORD - 1) // BASES_PER_WORD


def pack_reads(codes: jax.Array) -> jax.Array:
    """[B, L] uint8 codes (0..3) -> [B, ceil(L/16)] uint32 packed.

    Tail positions must be pre-zeroed by the caller (they are masked by
    length in downstream ops).
    """
    B, L = codes.shape
    W = words_for(L)
    pad = W * BASES_PER_WORD - L
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
    lanes = codes.reshape(B, W, BASES_PER_WORD).astype(jnp.uint32)
    shifts = (2 * jnp.arange(BASES_PER_WORD, dtype=jnp.uint32))[None, None, :]
    return (lanes << shifts).sum(axis=2, dtype=jnp.uint32)


def revcomp_codes(codes: jax.Array, lengths: jax.Array) -> jax.Array:
    """Per-read reverse complement of [B, L] codes with per-read lengths.

    Position j of the output is complement(codes[length-1-j]) for j < length,
    zero elsewhere.
    """
    B, L = codes.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lengths[:, None] - 1 - j
    valid = src >= 0
    gathered = jnp.take_along_axis(codes, jnp.maximum(src, 0).astype(jnp.int32), axis=1)
    return jnp.where(valid, 3 - gathered, 0).astype(jnp.uint8)
