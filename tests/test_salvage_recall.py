"""Short-tail-exon junction recall through the fused ladder (VERDICT r3
weak #8 / task 10): reads whose junction leaves a tail exon around the
trigger margins must still get their junction — the salvage scan ranks
window offsets by the longest read-end-anchored clean run and anchors
the splice dinucleotide at the run boundary (ladder.py salvage +
localscan.scan_fragment_runs).

The irreducible remainder (documented, matching altsplice.c): tail
exons <= ~8 bp often have several equal-mismatch canonical placements
inside the intron window (E[alternates] = W/4^(m+2)); those are
demoted to soft clips with XA alternatives, as the reference does."""
import numpy as np
import pytest

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.io.fasta import Record


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(7)
    GLEN = 60_000
    g = list("ACGT"[i] for i in rng.integers(0, 4, GLEN))
    introns = []
    for a in range(15_000, 55_000, 5_000):
        b = a + 1_500
        g[a], g[a + 1], g[b - 2], g[b - 1] = "G", "T", "A", "G"
        introns.append((a, b))
    seq = "".join(g)
    d = tmp_path_factory.mktemp("salv")
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="sv", k=13, interval=3)
    return db, DeviceIndex.from_host(db), seq, introns


def _recall(db, index, seq, introns, m, n=8):
    reads, truth = [], []
    for t in range(n):
        a, b = introns[(m + t) % len(introns)]
        reads.append(Record(f"m{m}_{t}", "",
                            seq[a - (100 - m):a] + seq[b:b + m]))
        truth.append((a, b))
    out = align_records(db, index, reads, AlignConfig(),
                        novelsplicing=True)
    ok = 0
    for rec, (a, b) in zip(out, truth):
        cur = rec.pos - 1
        num = 0
        njs = []
        for ch in rec.cigar:
            if ch.isdigit():
                num = num * 10 + ord(ch) - 48
            else:
                if ch == "N":
                    njs.append((cur, cur + num))
                    cur += num
                elif ch in "MD=X":
                    cur += num
                num = 0
        ok += (a, b) in njs
    return ok / n


def test_tail_exon_recall(world):
    db, index, seq, introns = world
    # comfortably-seedable tails: at ceiling
    assert _recall(db, index, seq, introns, 13) >= 0.9
    assert _recall(db, index, seq, introns, 10) >= 0.9
    # the salvage-margin tail (SPLICE triggers - 1 territory): most
    # found; the remainder is ambiguous-placement demotion (see module
    # docstring)
    assert _recall(db, index, seq, introns, 7) >= 0.5
