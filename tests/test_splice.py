"""Novel splice junction detection (GSNAP RNA mode)."""
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
def splice_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("splice")
    rng = np.random.default_rng(99)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 50000))
    # implant a GT..AG intron at [10000, 11000)
    seq = seq[:10000] + "GT" + seq[10002:10998] + "AG" + seq[11000:]
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    recs, lines, truth = [], [], []
    for r in range(20):
        split = int(rng.integers(20, 80))
        s = seq[10000 - split:10000] + seq[11000:11000 + 100 - split]
        rc = r % 2 == 0
        if rc:
            s = s.translate(comp)[::-1]
        recs.append(Record(f"s{r}_{split}", "", s))
        lines.append(f">s{r}_{split}\n{s}\n")
        truth.append((10000 - split, split, rc))
    (d / "reads.fa").write_text("".join(lines))
    return d, recs, truth


def test_novel_splice_structure(splice_case):
    d, recs, truth = splice_case
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_records(db, index, recs, AlignConfig(), novelsplicing=True)
    for rec, (p, split, rc) in zip(outs, truth):
        assert rec.pos == p + 1, rec.qname
        assert rec.cigar == f"{split}M1000N{100 - split}M", rec.qname
        assert (rec.flag == 16) == rc, rec.qname
        assert "XS:A:+" in rec.tags, rec.qname
        assert "NM:i:0" in rec.tags, rec.qname


def test_no_splice_without_flag(splice_case):
    """Splice stage must be off unless novelsplicing is requested."""
    d, recs, truth = splice_case
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_records(db, index, recs[:4], AlignConfig(),
                         novelsplicing=False)
    for rec in outs:
        assert "N" not in rec.cigar


@need_oracle
def test_splice_vs_reference_gsnap(splice_case):
    """The reference prints multiple junction interpretations per read; our
    single choice must equal one of its zero-mismatch lines."""
    d, recs, truth = splice_case
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(d / "db"),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0",
                    str(d / "g.fa")], check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D", str(d / "db"), "-d",
                          "g", "-N", "1", "-A", "sam", str(d / "reads.fa")],
                         capture_output=True, text=True).stdout
    ref_lines = {}
    for line in ref.splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        ref_lines.setdefault(f[0], []).append((int(f[3]), f[5]))
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_records(db, index, recs, AlignConfig(), novelsplicing=True)
    agree = 0
    for rec in outs:
        if (rec.pos, rec.cigar) in ref_lines.get(rec.qname, []):
            agree += 1
    # the reference soft-clips very short splice ends and sometimes only
    # reports a shifted antisense interpretation (its line then carries a
    # wrong MD — see round-1 notes); test_novel_splice_structure already
    # asserts OUR output is exactly the implanted truth for all reads, so
    # only near-total agreement is required here
    assert agree >= len(outs) - 2
