"""The FULL production pipeline on a device mesh (parallel/pipeline.py).

Round-1 gap (VERDICT "sharded paths cover a fraction of the pipeline"):
the mesh path must run the real cascade (ends rung -> compaction ->
prevalent rung -> trim) and the chain-DP splice solver, not just the
basic substitution aligner — and produce byte-identical SAM to the
single-chip path.
"""
import numpy as np
import pytest

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.gsnap.paired import align_paired_records
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record
from tpumap.parallel.mesh import make_mesh
from tpumap.parallel.pipeline import MeshContext


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshpipe")
    rng = np.random.default_rng(77)
    g = list("ACGT"[i] for i in rng.integers(0, 4, 60000))
    # gene: exon[a0,a1) intron exon[b0,b1) intron exon[c0,..): the middle
    # exon is SHORT so one read spans two junctions
    a0, a1, b0, b1, c0 = 10000, 10300, 12000, 12030, 15000
    for (x, y) in ((a1, b0), (b1, c0)):
        g[x], g[x + 1], g[y - 2], g[y - 1] = "G", "T", "A", "G"
    seq = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    comp = str.maketrans("ACGT", "TGCA")

    reads = []
    for r in range(24):                                 # plain + subs
        p = int(rng.integers(0, 50000))
        s = list(seq[p:p + 100])
        for j in rng.choice(np.arange(5, 95), size=int(rng.integers(0, 3)),
                            replace=False):
            s[j] = "ACGT"[("ACGT".index(s[j]) + 1) % 4]
        s = "".join(s)
        if r % 3 == 0:
            s = s.translate(comp)[::-1]
        reads.append(Record(f"p{r}", "", s))
    for r in range(8):                                  # 1-junction splice
        split = int(rng.integers(25, 75))
        s = seq[a1 - split:a1] + seq[b0:b0 + 100 - split]
        reads.append(Record(f"s{r}", "", s))
    for r in range(4):                                  # 2-junction splice
        l0 = int(rng.integers(25, 35))
        s = (seq[a1 - l0:a1] + seq[b0:b1]
             + seq[c0:c0 + 100 - l0 - (b1 - b0)])
        reads.append(Record(f"j{r}", "", s))
    for r in range(4):                                  # dirty end (trim)
        p = int(rng.integers(20000, 40000))
        junk = "".join("ACGT"[i] for i in rng.integers(0, 4, 12))
        reads.append(Record(f"t{r}", "", seq[p:p + 88] + junk))
    return d, seq, reads


def _fields(rec):
    return (rec.qname, rec.flag, rec.rname, rec.pos, rec.mapq, rec.cigar,
            tuple(rec.tags))


def test_mesh_pipeline_matches_single_chip(world):
    d, seq, reads = world
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    cfg = AlignConfig()

    single = align_records(db, index, reads, cfg, novelsplicing=True)

    mesh = make_mesh(8, index_shards=1)
    ctx = MeshContext(mesh, db)
    meshed = align_records(db, ctx.index, reads, cfg, novelsplicing=True,
                           device_ctx=ctx)

    assert len(single) == len(meshed)
    n_spliced = n_2jct = 0
    for a, b in zip(single, meshed):
        assert _fields(a) == _fields(b), a.qname
        if "N" in a.cigar:
            n_spliced += 1
            if a.cigar.count("N") == 2:
                n_2jct += 1
    # the mesh run really exercised the splice solver + trimming
    assert n_spliced >= 10
    assert n_2jct >= 3
    assert any("S" in a.cigar for a in single if a.qname.startswith("t"))


def test_mesh_pipeline_paired(world):
    d, seq, reads = world
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    cfg = AlignConfig()
    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.default_rng(3)
    pairs = []
    for r in range(12):
        p = int(rng.integers(0, 50000))
        ins = int(rng.integers(260, 480))
        s1 = seq[p:p + 100]
        s2 = seq[p + ins - 100:p + ins].translate(comp)[::-1]
        pairs.append((Record(f"q{r}", "", s1), Record(f"q{r}", "", s2)))

    single = align_paired_records(db, index, pairs, cfg)
    mesh = make_mesh(8, index_shards=1)
    ctx = MeshContext(mesh, db)
    meshed = align_paired_records(db, ctx.index, pairs, cfg,
                                  device_ctx=ctx)
    for (a1, a2), (b1, b2) in zip(single, meshed):
        assert _fields(a1) == _fields(b1)
        assert _fields(a2) == _fields(b2)
        assert a1.flag & 0x2
