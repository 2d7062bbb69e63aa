"""MaxEnt splice model vs the probabilities printed in align.test.ok."""
import pathlib
import re

import numpy as np
import pytest

from tpumap.gmap import maxent
from tpumap.utils import dna

REF_TESTS = pathlib.Path("/root/reference/tests")


def test_tables_present():
    t = maxent.tables()
    assert t["me2x3donor"].shape == (16384,)
    assert t["me2x3acc9"].shape == (256,)


@pytest.mark.skipif(not (REF_TESTS / "align.test.ok").exists(),
                    reason="reference fixtures unavailable")
def test_probs_match_golden_her2():
    from tpumap.io.fasta import read_fasta
    chr17 = next(read_fasta(REF_TESTS / "ss.chr17test"))
    gc_, gn = dna.encode(chr17.sequence)
    exons, probs = [], []
    for line in open(REF_TESTS / "align.test.ok"):
        m = re.match(r"\s+(\d+)-(\d+)\s+\((\d+)-(\d+)\)\s+\d+%"
                     r"(\s+->\s+\.\.\.(\d+)\.\.\.\s+([\d.]+), ([\d.]+))?",
                     line)
        if m:
            exons.append((int(m.group(1)), int(m.group(2))))
            if m.group(5):
                probs.append((float(m.group(7)), float(m.group(8))))
    assert len(probs) == 26
    for i, (dp, ap) in enumerate(probs):
        don = maxent.donor_prob_at(gc_, gn, np.array([exons[i][1]]))[0]
        acc = maxent.acceptor_prob_at(gc_, gn,
                                      np.array([exons[i + 1][0] - 2]))[0]
        assert f"{don:.3f}" == f"{dp:.3f}", i
        assert f"{acc:.3f}" == f"{ap:.3f}", i


def test_consensus_sites_score_high():
    # textbook donor: CAG|GTAAGT ; acceptor: ...ttttttttttncAG|G
    don = "CAGGTAAGT"
    codes, _ = dna.encode(don)
    assert maxent.donor_prob(codes[None, :])[0] > 0.95
    acc = "TTTTTTTTTTTTTTTTTCAGGTT"
    codes, _ = dna.encode(acc)
    assert maxent.acceptor_prob(codes[None, :])[0] > 0.5


def test_n_handling_zeroes_prob():
    codes, nm = dna.encode("CAGGTANGT")
    assert maxent.donor_prob(codes[None, :], nm[None, :])[0] == 0.0
