"""Device mesh construction.

The reference has no distributed backend (pthreads + SysV shm only; see
SURVEY.md §2.6); scale-out here is a first-class new design: a 2-D
(data, index) mesh where read batches shard along `data` and — for
gsnapl-scale genomes whose k-mer positions don't fit one chip's HBM — the
index shards along `index` by oligo range, with candidate diagonals
all-gathered across index shards before verification.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"


def make_mesh(n_devices: int | None = None, index_shards: int = 1,
              devices=None) -> Mesh:
    """Build a (data, index) mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.array(devices[:n_devices])
    if n_devices % index_shards:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"index_shards={index_shards}")
    grid = devices.reshape(n_devices // index_shards, index_shards)
    return Mesh(grid, (DATA_AXIS, INDEX_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Reads shard along the data axis, replicated along index."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
