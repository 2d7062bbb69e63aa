"""Alignment-mode base-space transforms (cmet / atoi).

Capability analog of the reference's mode machinery (src/mode.h Mode_T,
src/cmet.c, src/atoi.c oligo-conversion tables, and the masked mismatch
kernels in src/genomebits_mismatches.*): bisulfite sequencing reads have
C->T conversions (mode cmet), RNA-editing reads have A->I(G) (mode atoi),
so seeding and verification run in a reduced base space.

Instead of the reference's 16k-entry per-oligo lookup tables, the
transforms are O(1) bit tricks on the 2-bit packed words (A=00 C=01 G=10
T=11, 16 bases/uint32):
    ct: C->T   set bit1 where bit0 is 1
    ga: G->A   clear bit1 where bit0 is 0
    ag: A->G   set bit1 where both bits are 0
    tc: T->C   clear bit1 where both bits are 1
A read aligned on the opposite strand sees the complementary conversion
(ct <-> ga, ag <-> tc), matching the reference's metct/metga and
a2iag/a2itc index pairs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LOW = 0x55555555

# numpy code-space maps (for host-side index building)
CODE_MAPS = {
    "ct": np.array([0, 3, 2, 3], dtype=np.uint8),
    "ga": np.array([0, 1, 0, 3], dtype=np.uint8),
    "ag": np.array([2, 1, 2, 3], dtype=np.uint8),
    "tc": np.array([0, 1, 2, 1], dtype=np.uint8),
}

# which packed-space transform applies per (mode, strand)
MODE_SPACES = {
    "standard": (None, None),
    "cmet-stranded": ("ct", "ga"),
    "atoi-stranded": ("ag", "tc"),
    "ttoc-stranded": ("tc", "ag"),
}


def transform_packed(words, space: str | None):
    """Apply a base-space transform to 2-bit packed uint32 words."""
    if space is None:
        return words
    low = jnp.uint32(LOW)
    if space == "ct":
        return words | ((words & low) << 1)
    if space == "ga":
        return words & ~((~words & low) << 1)
    if space == "ag":
        return words | ((~(words | (words >> 1)) & low) << 1)
    if space == "tc":
        return words & ~(((words & (words >> 1)) & low) << 1)
    raise ValueError(space)


def transform_packed_np(words: np.ndarray, space: str | None) -> np.ndarray:
    if space is None:
        return words
    w = words.astype(np.uint32)
    low = np.uint32(LOW)
    if space == "ct":
        return w | ((w & low) << np.uint32(1))
    if space == "ga":
        return w & ~((~w & low) << np.uint32(1))
    if space == "ag":
        return w | ((~(w | (w >> np.uint32(1))) & low) << np.uint32(1))
    if space == "tc":
        return w & ~(((w & (w >> np.uint32(1))) & low) << np.uint32(1))
    raise ValueError(space)
