"""Genome-sharded (gmapl/gsnapl-scale) alignment on a virtual 8-device
CPU mesh: per-window uint32 coordinates + host uint64 rebase must agree
with the single-index reference pipeline."""
import numpy as np
import pytest

import jax

from tpumap.gsnap.engine import AlignConfig, align_batch
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.parallel.large import (make_genome_sharded_aligner,
                                   rebase_results, shard_genome_host)
from tpumap.parallel.mesh import make_mesh
from tpumap.utils import dna


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(23)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 64000))
    fa = tmp_path_factory.mktemp("lg") / "g.fa"
    fa.write_text(">chr1\n" + seq + "\n")
    db = build_db(fa, name="lg", k=10, interval=3)
    comp = str.maketrans("ACGT", "TGCA")
    reads, truth = [], []
    for r in range(32):
        p = int(rng.integers(0, len(seq) - 80))
        s = seq[p:p + 80]
        rc = r % 2 == 1
        if rc:
            s = s.translate(comp)[::-1]
        reads.append(s)
        truth.append((p, rc))
    return db, seq, reads, truth


def make_batch(reads, B, L):
    codes = np.zeros((B, L), dtype=np.uint8)
    nmask = np.zeros((B, L), dtype=bool)
    lengths = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(reads):
        c, m = dna.encode(s)
        codes[i, :len(s)] = c
        nmask[i, :len(s)] = m
        lengths[i] = len(s)
    return {"codes": codes, "nmask": nmask, "lengths": lengths}


def test_shard_genome_host_content(world):
    db, seq, _, _ = world
    parts = shard_genome_host(db, 4, overlap=256)
    assert parts["bases"][0] == 0
    assert parts["bases"].dtype == np.uint64
    # window 1 starts word-aligned and overlaps window 0's tail
    b1 = int(parts["bases"][1])
    assert b1 % 16 == 0
    # local window content matches the genome at the rebased coordinate
    codes1 = dna.unpack_2bit(parts["genome_packed"][1],
                             int(parts["lengths"][1]))
    assert dna.decode(codes1[:50], np.zeros(50, bool)) == seq[b1:b1 + 50]


def test_genome_sharded_matches_single_chip(world):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    db, seq, reads, truth = world
    mesh = make_mesh(8, index_shards=4)      # 2 data x 4 genome windows
    config = AlignConfig(top_k=4, max_occ=16)
    arrays, align, bases = make_genome_sharded_aligner(mesh, db, config,
                                                       overlap=256)
    batch = make_batch(reads, 32, 80)
    res = align(arrays, {k: jax.numpy.asarray(v) for k, v in batch.items()})
    res = {k: np.asarray(v) for k, v in res.items()}
    univ = rebase_results(res, bases)

    index = DeviceIndex.from_host(db)
    ref = align_batch(index, {k: jax.numpy.asarray(v)
                              for k, v in batch.items()}, config)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    for i, (p, rc) in enumerate(truth):
        assert bool(res["mapped"][i])
        assert res["nmismatch"][i] == ref["nmismatch"][i]
        assert int(res["strand"][i]) == int(rc)
        assert int(univ[i]) == p


def test_rebase_past_32_bits():
    """The host rebase must produce true uint64 univcoords (the gmapl
    regime); device coords stay uint32 window-local."""
    bases = np.asarray([0, 3 << 32], dtype=np.uint64)
    res = {"shard": np.asarray([1, 0]),
           "diag": np.asarray([12345, 7], dtype=np.uint32)}
    univ = rebase_results(res, bases)
    assert univ.dtype == np.uint64
    assert int(univ[0]) == (3 << 32) + 12345
    assert int(univ[1]) == 7


def test_uint64_build_roundtrip(world, tmp_path):
    """The forced-large build (LARGE_GENOMES dtype switch,
    src/types.h:38-58) produces uint64 positions, round-trips through
    save/load, refuses the single-chip DeviceIndex with a pointer to
    window sharding, and aligns correctly through the sharded path."""
    db, seq, reads, truth = world
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1\n" + seq + "\n")
    dbl = build_db(fa, name="lg64", k=10, interval=3, large=True)
    assert dbl.positions.dtype == np.uint64
    # identical index content modulo dtype
    assert np.array_equal(dbl.offsets, db.offsets)
    assert np.array_equal(dbl.positions.astype(np.uint32), db.positions)

    dbl.save(str(tmp_path / "db64"))
    from tpumap.index.build import GenomeDB
    dbl2 = GenomeDB.load(str(tmp_path / "db64"))
    assert dbl2.positions.dtype == np.uint64

    with pytest.raises(ValueError, match="uint32 coordinate space"):
        DeviceIndex.from_host(dbl2)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, index_shards=4)
    config = AlignConfig(top_k=4, max_occ=16)
    arrays, align, bases = make_genome_sharded_aligner(mesh, dbl2, config,
                                                       overlap=256)
    batch = make_batch(reads, 32, 80)
    res = align(arrays, {k: jax.numpy.asarray(v) for k, v in batch.items()})
    res = {k: np.asarray(v) for k, v in res.items()}
    univ = rebase_results(res, bases)
    for i, (p, rc) in enumerate(truth):
        assert bool(res["mapped"][i])
        assert int(univ[i]) == p
