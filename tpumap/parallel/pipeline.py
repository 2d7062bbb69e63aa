"""Mesh execution of the FULL production GSNAP pipeline.

Round-1 sharded paths (`parallel/sharded.py`, `parallel/large.py`)
re-implemented only the basic substitution aligner; this module instead
runs the REAL pipeline — `align_batch_cascaded_packed` (ends rung ->
compaction -> prevalent rung -> trim stage) and the chain-DP splice
solver (`ops/pathdp.chain_solve`) — across a device mesh by sharding
the batch along the `data` axis and replicating the index, letting
XLA's GSPMD partitioner place every stage (the "pick a mesh, annotate
shardings, let XLA insert collectives" recipe).

The host drivers (`gsnap/driver.py`, `gsnap/paired.py`) take a
`device_ctx`; `MeshContext` here is a drop-in that routes their two hot
device calls onto the mesh, so the SAME driver code (refinement ladder,
paired concordance, SAM emission) serves single-chip and pod-scale
deployments — the reference's one-process-per-core model
(src/gsnap.c worker threads) has no analog because the mesh IS the
worker pool.

For indexes too big for one chip's HBM, `parallel/sharded.py` (oligo
range sharding) and `parallel/large.py` (genome window sharding) remain
the seed-stage fallbacks.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpumap.gsnap.engine import AlignConfig, align_batch_cascaded_packed
from tpumap.index.build import GenomeDB
from tpumap.index.device import DeviceIndex
from tpumap.ops import pathdp
from tpumap.parallel.mesh import DATA_AXIS


class SingleChipContext:
    """Default device context: plain single-device calls."""

    def cascade(self, index, pbatch, config, L):
        return align_batch_cascaded_packed(index, pbatch, config, L)

    def chain_solve(self, index, codes, nmask, lengths, diags, **kw):
        return pathdp.chain_solve(index, codes, nmask, lengths, diags,
                                  **kw)


class MeshContext(SingleChipContext):
    """Run the production cascade + chain solver over a jax Mesh.

    Batch rows are sharded along the `data` axis (driver batch buckets
    are all multiples of 8/16, so they divide any practical mesh);
    the index is replicated. Construction places the index once.
    """

    def __init__(self, mesh, db: GenomeDB):
        self.mesh = mesh
        self._repl = NamedSharding(mesh, P())
        self._rows = NamedSharding(mesh, P(DATA_AXIS))
        self.index = DeviceIndex.from_host(db, device=self._repl)

    def _put_rows(self, tree):
        ndev = self.mesh.shape[DATA_AXIS]

        def put(x):
            if hasattr(x, "shape") and x.ndim >= 1 and \
                    x.shape[0] % ndev == 0:
                return jax.device_put(x, self._rows)
            return jax.device_put(x, self._repl)
        return jax.tree_util.tree_map(put, tree)

    def cascade(self, index, pbatch, config, L):
        return align_batch_cascaded_packed(
            self.index, self._put_rows(pbatch), config, L)

    def chain_solve(self, index, codes, nmask, lengths, diags, **kw):
        quals = kw.pop("quals", None)
        if quals is not None:
            quals = self._put_rows(quals)
        known = kw.pop("known", None)
        if known is not None:           # small site tables: replicate
            known = {k: jax.device_put(np.asarray(v), self._repl)
                     for k, v in known.items()}
        return pathdp.chain_solve(
            self.index, self._put_rows(codes), self._put_rows(nmask),
            self._put_rows(lengths), self._put_rows(diags),
            quals=quals, known=known, **kw)


def make_mesh_context(mesh, db: GenomeDB) -> MeshContext:
    return MeshContext(mesh, db)
