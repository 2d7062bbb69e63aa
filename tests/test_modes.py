"""Bisulfite (cmet) and RNA-editing (atoi) alignment modes."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record
from tpumap.ops import mode as mode_ops
from tpumap.utils import dna


def test_packed_transforms_match_code_maps():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 64).astype(np.uint8)
    packed = dna.pack_2bit(codes)
    for space, cmap in mode_ops.CODE_MAPS.items():
        tw = mode_ops.transform_packed_np(packed, space)
        np.testing.assert_array_equal(dna.unpack_2bit(tw, 64), cmap[codes],
                                      err_msg=space)
        tw_dev = np.asarray(mode_ops.transform_packed(jnp.asarray(packed),
                                                      space))
        np.testing.assert_array_equal(tw_dev, tw, err_msg=space)


@pytest.fixture(scope="module")
def mode_world(tmp_path_factory):
    d = tmp_path_factory.mktemp("modes")
    rng = np.random.default_rng(33)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    for space in ("ct", "ga", "ag", "tc"):
        db.add_mode_index(space)
    return db, DeviceIndex.from_host(db), seq


def test_cmet_stranded(mode_world):
    db, index, seq = mode_world
    rng = np.random.default_rng(7)
    comp = str.maketrans("ACGT", "TGCA")
    recs, truth = [], []
    for r in range(30):
        p = int(rng.integers(0, len(seq) - 100))
        s = seq[p:p + 100]
        if r % 2 == 0:
            s2, rc = s.replace("C", "T"), False
        else:
            s2, rc = s.translate(comp)[::-1].replace("C", "T"), True
        recs.append(Record(f"b{r}", "", s2))
        truth.append((p, rc))
    outs = align_records(db, index, recs, AlignConfig(mode="cmet-stranded"))
    for rec, (p, rc) in zip(outs, truth):
        assert rec.flag != 4 and rec.pos == p + 1, rec.qname
        assert bool(rec.flag & 16) == rc, rec.qname
        # conversions are matches under the mode-aware MD/NM
        assert "NM:i:0" in rec.tags, rec.qname


def test_atoi_stranded(mode_world):
    db, index, seq = mode_world
    rng = np.random.default_rng(8)
    comp = str.maketrans("ACGT", "TGCA")
    recs, truth = [], []
    for r in range(20):
        p = int(rng.integers(0, len(seq) - 100))
        s = seq[p:p + 100]
        if r % 2 == 0:
            s2, rc = s.replace("A", "G"), False   # A->I read as G
        else:
            s2, rc = s.translate(comp)[::-1].replace("A", "G"), True
        recs.append(Record(f"a{r}", "", s2))
        truth.append((p, rc))
    outs = align_records(db, index, recs, AlignConfig(mode="atoi-stranded"))
    for rec, (p, rc) in zip(outs, truth):
        assert rec.flag != 4 and rec.pos == p + 1, rec.qname
        assert bool(rec.flag & 16) == rc, rec.qname


def test_standard_mode_unaffected(mode_world):
    db, index, seq = mode_world
    recs = [Record("n0", "", seq[500:600])]
    outs = align_records(db, index, recs, AlignConfig())
    assert outs[0].pos == 501 and outs[0].cigar == "100M"
