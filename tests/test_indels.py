"""Indel alignment: CIGAR/position parity vs the reference gsnap."""
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
def indel_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("indel")
    rng = np.random.default_rng(77)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    recs, lines = [], []
    for r in range(30):
        p = int(rng.integers(0, len(seq) - 120))
        kind = r % 3
        if kind == 1:
            s = list(seq[p:p + 103])
            del s[40:43]
        elif kind == 2:
            s = list(seq[p:p + 98])
            s[50:50] = ["A", "C"]
        else:
            s = list(seq[p:p + 100])
        s = "".join(s[:100])
        if r % 2 == 0:
            s = s.translate(comp)[::-1]
        recs.append(Record(f"r{r}_{kind}", "", s))
        lines.append(f">r{r}_{kind}\n{s}\n")
    (d / "reads.fa").write_text("".join(lines))
    return d, recs


def test_indel_alignment_structure(indel_case):
    d, recs = indel_case
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_records(db, index, recs, AlignConfig())
    for rec in outs:
        kind = int(rec.qname.split("_")[1])
        assert rec.flag != 4
        if kind == 1:
            assert "3D" in rec.cigar, rec.qname
        elif kind == 2:
            assert "2I" in rec.cigar, rec.qname
        else:
            assert rec.cigar == "100M", rec.qname


@need_oracle
def test_indel_parity_vs_reference(indel_case):
    d, recs = indel_case
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(d / "db"),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0",
                    str(d / "g.fa")], check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D", str(d / "db"), "-d",
                          "g", "-A", "sam", str(d / "reads.fa")],
                         capture_output=True, text=True).stdout
    refmap = {}
    for line in ref.splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if f[0] not in refmap:
            refmap[f[0]] = (int(f[3]), f[5], int(f[1]))
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_records(db, index, recs, AlignConfig())
    for rec in outs:
        rp, rcig, rf = refmap[rec.qname]
        assert rec.pos == rp, rec.qname
        assert rec.cigar == rcig, rec.qname
        assert (rec.flag & 16) == (rf & 16), rec.qname
