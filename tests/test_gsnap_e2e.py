"""End-to-end single-end alignment vs the reference gsnap oracle."""
import pathlib
import subprocess

import numpy as np
import pytest

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import read_fasta

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")

need_oracle = pytest.mark.skipif(
    not (REFBIN / "gsnap").exists() or not GMAP_BUILD.exists(),
    reason="reference oracle binaries unavailable")


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(123)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    genome_fa = root / "genome.fa"
    genome_fa.write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    lines = []
    truth = []
    for r in range(60):
        p = int(rng.integers(0, len(seq) - 100))
        s = list(seq[p:p + 100])
        nsub = int(rng.integers(0, 3))
        for _ in range(nsub):
            j = int(rng.integers(0, 100))
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        s = "".join(s)
        rc = bool(rng.random() < 0.5)
        if rc:
            s = s.translate(comp)[::-1]
        lines.append(f">r{r}\n{s}\n")
        truth.append((p, rc))
    reads_fa = root / "reads.fa"
    reads_fa.write_text("".join(lines))
    return root, genome_fa, reads_fa, truth


def test_align_vs_truth(synthetic):
    root, genome_fa, reads_fa, truth = synthetic
    db = build_db(genome_fa, name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    records = list(read_fasta(reads_fa))
    out = align_records(db, index, records, AlignConfig())
    assert len(out) == len(truth)
    n_ok = 0
    for rec, (p, rc) in zip(out, truth):
        assert rec.flag != 4, f"{rec.qname} unmapped"
        # end trimming may soft-clip a terminal mismatch run (reference
        # does the same, src/spliceends.c trim scoring); the position
        # then shifts by the leading clip length
        clip = 0
        if "S" in rec.cigar.split("M")[0]:
            clip = int(rec.cigar.split("S")[0])
        assert rec.pos == p + 1 + clip, rec.qname
        assert (rec.flag == 16) == rc, rec.qname
        n_ok += 1
    assert n_ok == len(truth)


def test_dirty_ends_clean_middle(synthetic):
    """The Extension_search hard case (src/extension-search.c Elt runs):
    substitutions planted inside BOTH end k-mers kill the ends rung, so
    only dense interior seeding (prevalent rung) can place the read.
    Validates the 'extension search subsumed by dense seeding' design
    claim against its adversarial input."""
    from tpumap.io.fasta import Record

    root, genome_fa, reads_fa, truth = synthetic
    db = build_db(genome_fa, name="g2", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    seq = "".join(r.sequence for r in read_fasta(genome_fa))
    rng = np.random.default_rng(77)
    recs, want = [], []
    for r in range(24):
        p = int(rng.integers(0, len(seq) - 100))
        s = list(seq[p:p + 100])
        # corrupt positions 3 and 96: inside the first and last 12-mer,
        # and (interval 3) inside every oligo covering the read ends
        for j in (3, 96):
            s[j] = "ACGT"[(("ACGT".index(s[j])) + 1) % 4]
        recs.append(Record(f"d{r}", "", "".join(s)))
        want.append(p)
    out = align_records(db, index, recs, AlignConfig())
    for rec, p in zip(out, want):
        assert not rec.flag & 4, rec.qname
        clip = 0
        if "S" in rec.cigar.split("M")[0]:
            clip = int(rec.cigar.split("S")[0])
        assert rec.pos == p + 1 + clip, (rec.qname, rec.pos, p)


@need_oracle
def test_align_vs_reference_gsnap(synthetic):
    root, genome_fa, reads_fa, truth = synthetic
    dbdir = root / "refdb"
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(dbdir),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0",
                    str(genome_fa)], check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D", str(dbdir), "-d", "g",
                          "-A", "sam", str(reads_fa)],
                         check=True, capture_output=True, text=True)
    ref_hits = {}
    for line in ref.stdout.splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        name, flag, pos = f[0], int(f[1]), int(f[3])
        if name not in ref_hits:  # primary alignment only
            ref_hits[name] = (pos, bool(flag & 16), flag & 4)

    db = build_db(genome_fa, name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    records = list(read_fasta(reads_fa))
    out = align_records(db, index, records, AlignConfig())
    for rec in out:
        rpos, rrc, runmapped = ref_hits[rec.qname]
        if runmapped:
            continue
        assert rec.pos == rpos, rec.qname
        assert (rec.flag == 16) == rrc, rec.qname
