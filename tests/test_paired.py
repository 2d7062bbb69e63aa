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


def test_paired_bulk_emitter_parity(paired_case, monkeypatch):
    """The native bulk paired emitter (io/sam_bulk.py + sam_emit.cc
    mate columns) produces byte-identical SAM lines to the Python
    record path for plain concordant pairs."""
    from tpumap.gsnap.paired import align_paired_records as apr
    from tpumap.io import sam_bulk

    d, pairs, truth = paired_case
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    out_bulk = apr(db, index, pairs, AlignConfig())
    n_raw = sum(isinstance(s, sam_bulk.RawSamRecord)
                for pr in out_bulk for s in pr)
    if n_raw == 0:
        pytest.skip("native library unavailable")
    monkeypatch.setattr(sam_bulk, "_lib", None)
    monkeypatch.setattr(sam_bulk, "_lib_tried", True)
    out_py = apr(db, index, pairs, AlignConfig())
    for (a1, a2), (b1, b2) in zip(out_bulk, out_py):
        assert a1.lines() == b1.lines()
        assert a2.lines() == b2.lines()


def test_concordance_device_matches_host():
    """Device concordance kernel vs the host reference implementation on
    random candidate sets: same validity and same nmm-sum (tie-breaks may
    legitimately pick a different equal-score pairing)."""
    import jax.numpy as jnp

    from tpumap.gsnap.paired import _concordant_pairs, concordance_device

    rng = np.random.default_rng(5)
    P, K = 64, 8
    d1 = rng.integers(0, 100000, (P, K)).astype(np.uint32)
    d2 = rng.integers(0, 100000, (P, K)).astype(np.uint32)
    # make some concordant: d2 near d1 on opposite strands
    for p in range(0, P, 2):
        d2[p, 0] = d1[p, 0] + rng.integers(50, 800)
    s1 = rng.integers(0, 2, (P, K)).astype(np.int32)
    s2 = 1 - s1
    s1[:, :] = 0                       # end1 forward -> FR geometry fwd
    s2[:, :] = 1
    n1 = rng.integers(0, 5, (P, K)).astype(np.int32)
    n2 = rng.integers(0, 5, (P, K)).astype(np.int32)
    # mask a few candidates
    d1[rng.random((P, K)) < 0.2] = 0xFFFFFFFF
    d2[rng.random((P, K)) < 0.2] = 0xFFFFFFFF
    L = np.full(P, 100, np.int32)

    ci, cj, valid, ins = concordance_device(
        jnp.asarray(d1), jnp.asarray(s1), jnp.asarray(n1), jnp.asarray(L),
        jnp.asarray(d2), jnp.asarray(s2), jnp.asarray(n2), jnp.asarray(L),
        1000, "FR", 400, 100)
    ci, cj, valid, ins = (np.asarray(ci), np.asarray(cj),
                          np.asarray(valid), np.asarray(ins))
    for p in range(P):
        host = _concordant_pairs((d1[p], s1[p], n1[p]), (d2[p], s2[p], n2[p]),
                                 100, 100, 1000, "FR", pairexpect=400)
        assert bool(valid[p]) == (host is not None), p
        if host is None:
            continue
        _, hi, hj, hins = host
        # same alignment quality (insert-model tie-breaks may differ)
        assert (n1[p][ci[p]] + n2[p][cj[p]]
                <= n1[p][hi] + n2[p][hj]), p
        # and the device pick is genuinely concordant
        assert d1[p][ci[p]] != 0xFFFFFFFF and d2[p][cj[p]] != 0xFFFFFFFF
        assert 0 < ins[p] <= 1000


def test_exhaustive_fallback(tmp_path):
    """Both ends map, but end 2's best placement is a decoy far from end 1
    (no concordant candidate combination): the EXHAUSTIVE fallback must
    re-place end 2 inside end 1's insert window
    (src/stage1hr-paired.c:3409-3547 role)."""
    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    comp = str.maketrans("ACGT", "TGCA")
    p = 5000
    s1 = seq[p:p + 100]
    mate_region = seq[p + 300:p + 400]
    # plant an EXACT decoy copy of the mate far away; the true location
    # gets 2 substitutions so the decoy wins single-end alignment
    true_m = list(mate_region)
    true_m[10] = "ACGT"[("ACGT".index(true_m[10]) + 1) % 4]
    true_m[60] = "ACGT"[("ACGT".index(true_m[60]) + 1) % 4]
    genome = (seq[:p + 300] + "".join(true_m) + seq[p + 400:20000]
              + mate_region + seq[20000:])
    (tmp_path / "g.fa").write_text(">chr1\n" + genome + "\n")
    db = build_db(tmp_path / "g.fa", name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    s2 = mate_region.translate(comp)[::-1]
    out = align_paired_records(db, index,
                               [(Record("x", "", s1), Record("x", "", s2))],
                               AlignConfig(), pairmax=1000)
    r1, r2 = out[0]
    assert not r1.flag & 4 and not r2.flag & 4
    assert r1.pos == p + 1
    # mate must sit in the insert window next to end 1, not at the decoy
    assert abs(r2.pos - (p + 301)) <= 2, r2.pos
    assert r1.flag & 0x2
