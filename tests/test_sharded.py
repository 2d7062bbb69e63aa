"""Index-sharded + data-parallel alignment on a virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from tpumap.gsnap.engine import AlignConfig, align_batch
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.parallel.mesh import make_mesh, batch_sharding
from tpumap.parallel.sharded import make_sharded_aligner, shard_index_host
from tpumap.utils import dna


@pytest.fixture(scope="module")
def db_and_reads(tmp_path_factory):
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    fa = tmp_path_factory.mktemp("sh") / "g.fa"
    fa.write_text(">chr1\n" + seq + "\n")
    db = build_db(fa, name="g", k=8, interval=3)
    comp = str.maketrans("ACGT", "TGCA")
    reads, truth = [], []
    for r in range(16):
        p = int(rng.integers(0, len(seq) - 80))
        s = seq[p:p + 80]
        rc = r % 2 == 1
        if rc:
            s = s.translate(comp)[::-1]
        reads.append(s)
        truth.append((p, rc))
    return db, reads, truth


def make_batch(reads, B, L):
    import numpy as np
    codes = np.zeros((B, L), dtype=np.uint8)
    nmask = np.zeros((B, L), dtype=bool)
    lengths = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(reads):
        c, m = dna.encode(s)
        codes[i, :len(s)] = c
        nmask[i, :len(s)] = m
        lengths[i] = len(s)
    return {"codes": codes, "nmask": nmask, "lengths": lengths}


def test_shard_index_host_roundtrip(db_and_reads):
    db, _, _ = db_and_reads
    parts = shard_index_host(db, 4)
    # reassembling shard slices must give back the original positions array
    got = []
    span = parts["span"]
    for s in range(4):
        n = int(db.offsets[(s + 1) * span] - db.offsets[s * span])
        got.append(parts["positions"][s][:n])
    np.testing.assert_array_equal(np.concatenate(got), db.positions)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_chip(db_and_reads, shape):
    db, reads, truth = db_and_reads
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, index_shards=shape[1])
    config = AlignConfig(top_k=4, max_occ=16)
    arrays, align = make_sharded_aligner(mesh, db, config)
    batch = make_batch(reads, 16, 96)
    bsh = batch_sharding(mesh)
    dev_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    res = {k: np.asarray(v) for k, v in align(arrays, dev_batch).items()}

    # compare against single-chip reference engine
    index = DeviceIndex.from_host(db)
    import jax.numpy as jnp
    ref = align_batch(index, {k: jnp.array(v) for k, v in batch.items()}, config)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    np.testing.assert_array_equal(res["mapped"], ref["mapped"])
    np.testing.assert_array_equal(res["diag"], ref["diag"])
    np.testing.assert_array_equal(res["strand"], ref["strand"])
    np.testing.assert_array_equal(res["nmismatch"], ref["nmismatch"])
    for i, (p, rc) in enumerate(truth):
        assert res["diag"][i] == p
        assert res["strand"][i] == int(rc)


def test_sharded_full_ladder(tmp_path):
    """FULL-capability sharded-index mode (SURVEY §2.6 item 4): a
    spliced read and a concordant pair solve THROUGH the oligo-sharded
    path — trim + chain DP + paired concordance behind the all-gather
    (src/Makefile.am:366 LARGE_GENOMES role, src/stage1hr-paired.c)."""
    import jax.numpy as jnp
    from tpumap.ops import pathdp
    from tpumap.parallel.sharded import make_sharded_full_aligner
    from tpumap.utils import dna as dna_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(9)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 40000))
    g[8200:8202] = list("GT")
    g[8998:9000] = list("AG")
    seq = "".join(g)
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1\n" + seq + "\n")
    db = build_db(fa, name="g", k=10, interval=3)
    mesh = make_mesh(8, index_shards=2)
    config = AlignConfig(top_k=4, max_occ=16)
    arrays, align = make_sharded_full_aligner(
        mesh, db, config, scoring=pathdp.PathScoring(max_intron=5000),
        splicing=True, paired=True, pairmax=1500)
    B, L = 16, 128
    reads = [""] * B
    reads[0] = seq[20000:20100]                       # pair 0: FR
    reads[1] = dna_mod.revcomp(seq[20500:20600])
    reads[2] = seq[8150:8200] + seq[9000:9050]        # pair 1: spliced r1
    reads[3] = dna_mod.revcomp(seq[9300:9400])
    for i in range(4, B):
        p = 1000 + 61 * i
        reads[i] = seq[p:p + 100]
    batch = make_batch(reads, B, L)
    bsh = batch_sharding(mesh)
    dev_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    res = {k: np.asarray(v) for k, v in align(arrays, dev_batch).items()}
    assert bool(res["pe_valid"][0])
    ch_ok = res["ch_sel"] & (res["ch_idx"] == 2) & (res["ch_nsegs"] >= 2)
    assert bool(ch_ok.any())
    row = int(np.nonzero(ch_ok)[0][0])
    segd = res["ch_segd"][row]
    assert int(segd[1]) - int(segd[0]) == 800       # the planted intron
