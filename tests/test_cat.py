"""tpumap-cat (indexdb_cat/gmap_cat equivalent): concatenating databases
must equal building one database over the concatenated FASTA."""
import numpy as np
import pytest

from tpumap.cli.cat_cli import cat_dbs
from tpumap.index import build_db


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cat")
    rng = np.random.default_rng(31)
    seqs = {}
    for name, ln in (("chrA", 5003), ("chrB", 7000), ("chrC", 2999)):
        seqs[name] = "".join("ACGT"[i] for i in rng.integers(0, 4, ln))
    (d / "g1.fa").write_text(f">chrA\n{seqs['chrA']}\n>chrB\n{seqs['chrB']}\n")
    (d / "g2.fa").write_text(f">chrC\n{seqs['chrC']}\n")
    (d / "all.fa").write_text(
        f">chrA\n{seqs['chrA']}\n>chrB\n{seqs['chrB']}\n"
        f">chrC\n{seqs['chrC']}\n")
    return d


def test_cat_equals_joint_build(world):
    d = world
    db1 = build_db(d / "g1.fa", name="g1", k=10, interval=3)
    db2 = build_db(d / "g2.fa", name="g2", k=10, interval=3)
    joint = build_db(d / "all.fa", name="all", k=10, interval=3)
    merged = cat_dbs([db1, db2], "all")

    assert merged.chrom_names == joint.chrom_names
    assert np.array_equal(merged.chrom_offsets, joint.chrom_offsets)
    assert np.array_equal(merged.genome_packed, joint.genome_packed)
    assert np.array_equal(merged.genome_nmask, joint.genome_nmask)
    assert np.array_equal(merged.offsets, joint.offsets)
    # position sampling restarts at each input's coordinate 0 (chrB/chrC
    # boundary is not 16-aligned in the joint build either, since build_db
    # also concatenates per chromosome — content must be identical)
    assert np.array_equal(merged.positions, joint.positions)


def test_cat_rejects_mismatched_k(world):
    d = world
    db1 = build_db(d / "g1.fa", name="g1", k=10, interval=3)
    db2 = build_db(d / "g2.fa", name="g2", k=9, interval=3)
    with pytest.raises(ValueError):
        cat_dbs([db1, db2], "bad")


def test_cat_alignment(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record

    d = world
    db1 = build_db(d / "g1.fa", name="g1", k=10, interval=3)
    db2 = build_db(d / "g2.fa", name="g2", k=10, interval=3)
    merged = cat_dbs([db1, db2], "all")
    index = DeviceIndex.from_host(merged)
    read = db2.get_seq(500, 80)      # from chrC
    out = align_records(merged, index, [Record("r", "", read)])
    assert out[0].rname == "chrC"
    assert out[0].pos == 501
