"""Paired-end alignment: concordance, rescue, SAM flags; parity vs gsnap."""
import pathlib
import subprocess

import numpy as np
import pytest

from tpumap.gsnap.engine import AlignConfig
from tpumap.gsnap.paired import align_paired_records
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")

need_oracle = pytest.mark.skipif(
    not (REFBIN / "gsnap").exists() or not GMAP_BUILD.exists(),
    reason="reference oracle binaries unavailable")


@pytest.fixture(scope="module")
def paired_case(tmp_path_factory):
    d = tmp_path_factory.mktemp("paired")
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 40000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    pairs, truth = [], []
    f1, f2 = [], []
    for r in range(40):
        p = int(rng.integers(0, len(seq) - 600))
        insert = int(rng.integers(250, 500))
        s1 = seq[p:p + 100]
        s2 = seq[p + insert - 100:p + insert].translate(comp)[::-1]
        # a couple of substitutions on each end
        pairs.append((Record(f"p{r}", "", s1), Record(f"p{r}", "", s2)))
        truth.append((p, p + insert - 100, insert))
        f1.append(f">p{r}\n{s1}\n")
        f2.append(f">p{r}\n{s2}\n")
    (d / "r1.fa").write_text("".join(f1))
    (d / "r2.fa").write_text("".join(f2))
    return d, pairs, truth


def test_paired_concordant(paired_case):
    d, pairs, truth = paired_case
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_paired_records(db, index, pairs, AlignConfig())
    assert len(outs) == len(truth)
    for (s1, s2), (p1, p2, insert) in zip(outs, truth):
        assert s1.flag & 0x1 and s1.flag & 0x40
        assert s2.flag & 0x1 and s2.flag & 0x80
        assert s1.flag & 0x2 and s2.flag & 0x2, s1.qname
        assert s1.pos == p1 + 1 and s2.pos == p2 + 1, s1.qname
        assert not s1.flag & 0x10 and s2.flag & 0x10
        assert s1.tlen == insert and s2.tlen == -insert
        assert s1.rnext == "=" and s1.pnext == s2.pos


@need_oracle
def test_paired_parity_vs_reference(paired_case):
    d, pairs, truth = paired_case
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(d / "db"),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0",
                    str(d / "g.fa")], check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D", str(d / "db"), "-d",
                          "g", "-A", "sam", str(d / "r1.fa"),
                          str(d / "r2.fa")],
                         capture_output=True, text=True).stdout
    refmap = {}
    for line in ref.splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        which = 1 if int(f[1]) & 0x40 else 2
        refmap.setdefault((f[0], which), (int(f[3]), f[5], int(f[1]), int(f[8])))
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    outs = align_paired_records(db, index, pairs, AlignConfig())
    for s1, s2 in outs:
        for s, which in ((s1, 1), (s2, 2)):
            rp, rcig, rf, rtlen = refmap[(s.qname, which)]
            assert s.pos == rp, (s.qname, which)
            assert s.cigar == rcig, (s.qname, which)
            assert (s.flag & 0x10) == (rf & 0x10), (s.qname, which)
            assert s.tlen == rtlen, (s.qname, which)


def test_paired_spliced_end(tmp_path):
    """Paired RNA: an end spanning an intron gets a junction CIGAR while
    its mate pairs normally (the paired path shares the single-end
    refinement ladder, src/stage1hr-paired.c role)."""
    import numpy as np
    from tpumap.gsnap.paired import align_paired_records
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record
    from tpumap.utils import dna as dna_mod

    rng = np.random.default_rng(41)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (tmp_path / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(tmp_path / "g.fa", name="ps", k=13, interval=3)
    index = DeviceIndex.from_host(db)

    E1, E2 = 5000, 9000
    r1 = Record("p", "", seq[E1 - 20:E1 + 30] + seq[E2:E2 + 50])  # junction
    r2 = Record("p", "", dna_mod.revcomp(seq[E2 + 300:E2 + 400]))
    out = align_paired_records(db, index, [(r1, r2)],
                               novelsplicing=True, pairmax=2000)
    s1, s2 = out[0]
    assert f"{E2 - E1 - 30}N" in s1.cigar, s1
    assert s1.flag & 0x1 and s1.flag & 0x40
    assert not (s2.flag & 4)
    assert s2.flag & 16 and s2.flag & 0x80
