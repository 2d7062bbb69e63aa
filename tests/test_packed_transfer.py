"""Host-packed transfer path: 2-bit packing round trip through the
cascade and the N-free pnmask stub (transfer elision)."""
import pathlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    from tpumap.index import build_db

    d = tmp_path_factory.mktemp("pk")
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(">c\n" + seq + "\n")
    return build_db(d / "g.fa", name="g", k=10, interval=3), seq


def test_pnmask_stub_parity(small_db):
    """An N-free batch may ship a (1,1) pnmask stub; results must be
    identical to shipping the full zero mask (and the N-carrying path
    still works)."""
    import jax.numpy as jnp

    from tpumap.gsnap.driver import _pack_batch, make_batch
    from tpumap.gsnap.engine import AlignConfig, align_batch_cascaded_packed
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record

    db, seq = small_db
    index = DeviceIndex.from_host(db)
    recs = [Record(f"r{i}", "", seq[100 + 37 * i:200 + 37 * i])
            for i in range(32)]
    nseq = recs[5].sequence
    recs[5] = Record("rN", "", nseq[:50] + "N" + nseq[51:])
    pb = _pack_batch(make_batch(recs, 32, 112))
    assert pb["pnmask"].shape == pb["packed"].shape   # N present: full mask
    out_n = align_batch_cascaded_packed(index, pb, AlignConfig(), 112)
    assert np.asarray(out_n["mapped"]).all()

    recs[5] = Record("r5", "", nseq)
    pb2 = _pack_batch(make_batch(recs, 32, 112))
    assert pb2["pnmask"].shape == (1, 1)              # N-free: stub
    out_stub = align_batch_cascaded_packed(index, pb2, AlignConfig(), 112)
    pb3 = dict(pb2)
    pb3["pnmask"] = jnp.zeros_like(pb2["packed"])
    out_full = align_batch_cascaded_packed(index, pb3, AlignConfig(), 112)
    for k in out_stub:
        assert np.array_equal(np.asarray(out_stub[k]),
                              np.asarray(out_full[k])), k
