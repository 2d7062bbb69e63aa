"""Index-sharded, data-parallel alignment over a (data, index) mesh.

This is the pod-scale path (SURVEY.md §2.6 item 4): for genomes whose
k-mer positions array exceeds one chip's HBM, positions are sharded by
oligo range along the `index` mesh axis. Each device seeds its local read
shard against its local oligo range; candidate diagonals are then
all-gathered across the index axis (ICI collective) so every device can
verify its own reads against the (replicated or sharded) genome.

The single-chip fast path (index replicated) is gsnap.engine.align_batch;
this module is its shard_map generalization, and reduces to it for an
index axis of size 1.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpumap.gsnap.engine import AlignConfig, select_best
from tpumap.index.build import GenomeDB
from tpumap.ops import pack, seed, verify
from tpumap.parallel.mesh import DATA_AXIS, INDEX_AXIS

INVALID = np.uint32(0xFFFFFFFF)


def shard_index_host(db: GenomeDB, n_shards: int) -> dict:
    """Split the k-mer index into n_shards contiguous oligo ranges.

    Returns host arrays with a leading shard dimension:
      offsets   uint32[n_shards, 4^k//n_shards + 1]  (rebased per shard)
      positions uint32[n_shards, Pmax]               (INVALID padded)
    """
    noligos = 4 ** db.k
    if noligos % n_shards:
        raise ValueError("4^k must divide by n_shards")
    span = noligos // n_shards
    offs, poss = [], []
    pmax = 0
    for s in range(n_shards):
        lo, hi = s * span, (s + 1) * span
        o = db.offsets[lo:hi + 1].astype(np.int64)
        p = db.positions[o[0]:o[-1]]
        offs.append((o - o[0]).astype(np.uint32))
        poss.append(p)
        pmax = max(pmax, len(p))
    pmax += 64  # gather overrun pad
    positions = np.full((n_shards, pmax), 0xFFFFFFFF, dtype=np.uint32)
    for s, p in enumerate(poss):
        positions[s, :len(p)] = p
    return {
        "offsets": np.stack(offs),
        "positions": positions,
        "span": span,
    }


def make_sharded_aligner(mesh, db: GenomeDB, config: AlignConfig,
                         pad_words: int = 64):
    """Build (device_arrays, jitted fn(device_arrays, batch) -> results).

    device_arrays: genome replicated over the mesh; k-mer offsets/positions
    sharded along the index axis. batch arrays must be sharded along the
    data axis (or placed with the returned batch_sharding).
    """
    n_index = mesh.shape[INDEX_AXIS]
    parts = shard_index_host(db, n_index)
    k, span = db.k, parts["span"]

    repl = NamedSharding(mesh, P())
    idx_sh = NamedSharding(mesh, P(INDEX_AXIS))
    arrays = {
        "genome_packed": jax.device_put(
            np.concatenate([db.genome_packed, np.zeros(pad_words, np.uint32)]), repl),
        "genome_nmask": jax.device_put(
            np.concatenate([db.genome_nmask,
                            np.full(pad_words, 0xFFFFFFFF, np.uint32)]), repl),
        "offsets": jax.device_put(parts["offsets"], idx_sh),
        "positions": jax.device_put(parts["positions"], idx_sh),
    }

    def local_seed(offsets, positions, codes, nmask, lengths):
        """Seed a local read shard against the local oligo range."""
        oligos, valid = seed.query_oligos(codes, nmask, lengths, k)
        shard_id = jax.lax.axis_index(INDEX_AXIS).astype(jnp.uint32)
        lo = shard_id * jnp.uint32(span)
        in_range = (oligos >= lo) & (oligos < lo + jnp.uint32(span))
        local_oligo = jnp.where(in_range, oligos - lo, 0)
        NQ = oligos.shape[1]
        qpos = jnp.arange(NQ, dtype=jnp.int32)
        diags = seed.lookup_diagonals(offsets, positions, local_oligo,
                                      valid & in_range, qpos, config.max_occ)
        B = diags.shape[0]
        return diags.reshape(B, -1)

    def body(genome_packed, genome_nmask, offsets, positions,
             codes, nmask, lengths):
        offsets, positions = offsets[0], positions[0]

        class LocalIndex:
            pass
        li = LocalIndex()
        li.genome_packed = genome_packed
        li.genome_nmask = genome_nmask

        rc_codes = pack.revcomp_codes(codes, lengths)
        rc_nmask = pack.revcomp_codes(
            jnp.where(nmask, jnp.uint8(0), jnp.uint8(3)), lengths) == jnp.uint8(3)

        def one_strand(c, m):
            local = local_seed(offsets, positions, c, m, lengths)
            # union of candidates across index shards (ICI all-gather)
            gathered = jax.lax.all_gather(local, INDEX_AXIS, axis=0)
            B = c.shape[0]
            allc = gathered.transpose(1, 0, 2).reshape(B, -1)
            diags, _ = seed.prevalent_diagonals(allc, config.top_k)
            packed = pack.pack_reads(c)
            nmask2 = pack.pack_reads(m.astype(jnp.uint8))
            nmm = verify.verify_diagonals(li, packed, nmask2, lengths, diags)
            return diags, nmm

        fdiags, fnmm = one_strand(codes, nmask)
        rdiags, rnmm = one_strand(rc_codes, rc_nmask)
        B, K = fdiags.shape
        all_diags = jnp.concatenate([fdiags, rdiags], axis=1)
        all_nmm = jnp.concatenate([fnmm, rnmm], axis=1)
        strands = jnp.concatenate([jnp.zeros((B, K), jnp.int32),
                                   jnp.ones((B, K), jnp.int32)], axis=1)
        return select_best(all_diags, all_nmm, strands, lengths, config)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(INDEX_AXIS), P(INDEX_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False)

    @jax.jit
    def align(arrays, batch):
        return mapped(arrays["genome_packed"], arrays["genome_nmask"],
                      arrays["offsets"], arrays["positions"],
                      batch["codes"], batch["nmask"], batch["lengths"])

    return arrays, align
