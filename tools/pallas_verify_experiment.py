#!/usr/bin/env python3
"""Experiment (NEGATIVE RESULT, kept as documentation): Pallas verify
kernel with a VMEM-resident genome vs the XLA gather path.

The measured bottleneck of the whole cascade is the candidate-window
gather (~12 ns per gathered ELEMENT on this chip regardless of address
pattern — a gather-lowering tax, not HBM latency). Hypothesis: a Pallas
kernel walking (row, lane) pairs with scalar dynamic slices from a
VMEM-resident genome would beat it.

Outcome: Mosaic (TensorCore kernels) CANNOT express sub-128-lane dynamic
slices — "cannot statically prove that index in dimension 1 is a multiple
of 128" — for either direct `ref[pl.ds(w0, 8)]` loads or the
aligned-block + pltpu.roll + narrow-static-slice workaround. The VPU's
(8, 128) tiling makes per-row 8-word extraction a relayout the compiler
refuses; random access at sub-tile granularity is a hardware floor, not
an XLA artifact.

Consequence for the framework design (already applied in the engine):
minimize gathered ELEMENTS rather than hand-scheduling gathers —
candidate-lane dedup before verify, strand fusion into one call,
bit-twiddled packed revcomp instead of [B, L] element gathers, and the
static no-N flag that halves window fetches. Those took the cascade from
71k to 243k reads/s/chip; this kernel is kept as the record of why the
Pallas route was not taken for the verify op.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu




def make_kernel(W: int, C: int, TILE: int):
    def kernel(genome_ref, reads_ref, nmask_ref, lens_ref, diags_ref,
               out_ref):
        def row_body(r, _):
            read = reads_ref[r, :]                     # [W]
            nm2 = nmask_ref[r, :]
            length = lens_ref[r, 0]
            # length mask words
            base = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0] * 16
            nbits = jnp.clip(length - base, 0, 16)
            lmask = jnp.where(
                nbits >= 16, jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << (2 * nbits.astype(jnp.uint32)))
                - jnp.uint32(1))

            def lane_body(c, acc):
                diag = diags_ref[r, c]
                valid = diag != jnp.uint32(0xFFFFFFFF)
                start = jnp.where(valid, diag, 0)
                w0 = (start >> 4).astype(jnp.int32)
                s2 = ((start & 15) << 1).astype(jnp.uint32)
                # VMEM dynamic slices must be 128-lane aligned: load the
                # aligned 256-word block containing the window and rotate
                row0 = w0 >> 7
                lane0 = w0 & 127
                blk = genome_ref[pl.ds(row0, 2), :].reshape(256)
                g = pltpu.roll(blk, -lane0, 0)[:W + 1]
                lo = g[:W] >> s2
                hi = jnp.where(s2 == 0, jnp.uint32(0),
                               g[1:] << ((jnp.uint32(32) - s2)
                                         & jnp.uint32(31)))
                x = read ^ (lo | hi)
                mm = ((x | (x >> 1)) & jnp.uint32(0x55555555)) | nm2
                cnt = jax.lax.population_count(mm & lmask) \
                    .astype(jnp.int32).sum()
                val = jnp.where(valid, cnt.astype(jnp.int32), length)
                lane_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (C, 1), 0)[:, 0]
                return jnp.where(lane_iota == c, val, acc)

            row_out = jax.lax.fori_loop(
                0, C, lane_body, jnp.zeros((C,), jnp.int32))
            out_ref[r, :] = row_out
            return 0

        jax.lax.fori_loop(0, TILE, row_body, 0)

    return kernel


def verify_pallas(genome_packed, reads, nmask2, lengths, diags, TILE=256):
    B, W = reads.shape
    C = diags.shape[1]
    grid = (B // TILE,)
    g = genome_packed
    pad = (-len(g)) % 128
    g = jnp.pad(g, (0, pad + 128)).reshape(-1, 128)
    genome_packed = g
    return pl.pallas_call(
        make_kernel(W, C, TILE),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(genome_packed, reads, nmask2, lengths, diags)


def main():
    from tools import bench_data
    from tpumap.index import GenomeDB
    from tpumap.index.device import DeviceIndex
    from tpumap.ops import verify

    db = GenomeDB.load(str(bench_data.ROOT / "db_k14"))
    index = DeviceIndex.from_host(db)
    B, W, C = 8192, 7, 8
    rng = np.random.default_rng(0)
    reads = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint64)
                        .astype(np.uint32))
    nm2 = jnp.zeros((B, W), jnp.uint32)
    lengths = jnp.full((B, 1), 100, jnp.int32)
    diags = jnp.asarray(rng.integers(0, db.genome_length - 200, (B, C))
                        .astype(np.uint32))

    def timeit(f, *a, n=20):
        r = f(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    vp = jax.jit(lambda g, r, m, l, d: verify_pallas(g, r, m, l, d))
    out_p = vp(index.genome_packed, reads, nm2, lengths, diags)

    from functools import partial
    vx = jax.jit(partial(verify.verify_diagonals, index))
    out_x = vx(reads, nm2, lengths[:, 0], diags)
    match = bool(jnp.array_equal(out_p, out_x))
    tp = timeit(vp, index.genome_packed, reads, nm2, lengths, diags)
    tx = timeit(vx, reads, nm2, lengths[:, 0], diags)
    print(f"match={match}  pallas={tp*1e3:.2f} ms  xla={tx*1e3:.2f} ms")


if __name__ == "__main__":
    main()
