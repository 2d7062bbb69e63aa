"""Streaming (sink) emission parity: the blob path must produce the
same SAM text, in the same order, as the per-record list path."""
import numpy as np
import pytest

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record


@pytest.fixture(scope="module")
def mixed_workload(tmp_path_factory):
    """Genome + reads that exercise every row kind at once: plain subs,
    soft-clipped, spliced (chain-DP path rows), deletion, insertion
    (Python-override row), and unmapped."""
    root = tmp_path_factory.mktemp("stream")
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 60000))
    # plant a canonical GT..AG intron
    don, acc = 30100, 31000
    seq = seq[:don] + "GT" + seq[don + 2:acc - 2] + "AG" + seq[acc:]
    gfa = root / "g.fa"
    gfa.write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    reads = []
    for r in range(40):
        p = int(rng.integers(0, len(seq) - 100))
        s = list(seq[p:p + 100])
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(0, 100))
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(Record(f"sub{r}", "", "".join(s)))
    for r in range(12):  # spliced across the intron
        off = int(rng.integers(10, 60))
        s = seq[don - off:don] + seq[acc:acc + (100 - off)]
        reads.append(Record(f"spl{r}", "", s))
    for r in range(6):   # 4-base deletion
        p = 5000 + 700 * r
        s = seq[p:p + 50] + seq[p + 54:p + 104]
        reads.append(Record(f"del{r}", "", s))
    for r in range(6):   # 3-base insertion (Python-override path)
        p = 12000 + 700 * r
        s = seq[p:p + 50] + "ACG" + seq[p + 50:p + 97]
        reads.append(Record(f"ins{r}", "", s))
    for r in range(5):   # unmapped (random)
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
        reads.append(Record(f"unm{r}", "", s, "I" * 100))
    reads.append(Record("nn0", "", "ACGTN" * 20))
    db = build_db(gfa, name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    return db, index, reads


def _list_text(recs):
    return "".join(r.lines() for r in recs).encode()


@pytest.mark.parametrize("novel", [False, True])
def test_stream_matches_list(mixed_workload, novel):
    db, index, reads = mixed_workload
    cfg = AlignConfig(top_k=4, max_occ=8)
    want = _list_text(align_records(db, index, reads, cfg,
                                    novelsplicing=novel, batch_size=32))
    chunks = []
    stats = {}
    out = align_records(db, index, reads, cfg, novelsplicing=novel,
                        batch_size=32, sink=chunks.append, stats=stats)
    assert out == []
    got = b"".join(bytes(c) for c in chunks)
    assert got == want
    assert sum(stats.values()) == len(reads)


def test_paired_stream_matches_list(mixed_workload):
    """Paired sink mode: blob spans for plain pairs + spliced Python
    pairs, byte-identical to the list path in pair order."""
    from tpumap.gsnap.paired import align_paired_records
    from tpumap.utils.dna import revcomp

    db, index, reads = mixed_workload
    cfg = AlignConfig(top_k=4, max_occ=8)
    rng = np.random.default_rng(3)
    seq = None
    # rebuild pair fixtures from the genome itself
    g = db.get_seq(0, db.genome_length)
    pairs = []
    for r in range(25):
        p = int(rng.integers(0, len(g) - 700))
        r1 = Record(f"pp{r}/1", "", g[p:p + 100], "I" * 100)
        r2 = Record(f"pp{r}/2", "", revcomp(g[p + 400:p + 500]),
                    "I" * 100)
        pairs.append((r1, r2))
    # one discordant pair (mate unmapped)
    pairs.append((Record("dx/1", "", g[5000:5100]),
                  Record("dx/2", "", "".join(
                      "ACGT"[i] for i in rng.integers(0, 4, 100)))))
    want = b"".join(
        (a.lines() + b.lines()).encode()
        for a, b in align_paired_records(db, index, pairs, cfg,
                                         batch_size=16, pairmax=1000))
    chunks = []
    out = align_paired_records(db, index, pairs, cfg, batch_size=16,
                               pairmax=1000, sink=chunks.append)
    assert out == []
    assert b"".join(bytes(c) for c in chunks) == want


def test_stream_unbatched_tail(mixed_workload):
    """A run smaller than one batch (bucketed shapes) streams too."""
    db, index, reads = mixed_workload
    cfg = AlignConfig(top_k=4, max_occ=8)
    sub = reads[:7] + reads[-6:]
    want = _list_text(align_records(db, index, sub, cfg,
                                    novelsplicing=True))
    chunks = []
    align_records(db, index, sub, cfg, novelsplicing=True,
                  sink=chunks.append)
    assert b"".join(bytes(c) for c in chunks) == want
