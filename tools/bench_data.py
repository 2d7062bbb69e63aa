"""Shared benchmark workload generation (deterministic).

Used by bench.py (tpumap) and tools/measure_baseline.py (reference gsnap)
so both time exactly the same genome + reads.
"""
from __future__ import annotations

import os
import pathlib

import numpy as np

ROOT = pathlib.Path("/tmp/tpumap_bench")
GENOME_LEN = 5_000_000
N_READS = 50_000
READ_LEN = 100
SUB_RATE = 0.01


def genome_seq() -> str:
    rng = np.random.default_rng(0)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, GENOME_LEN))


def ensure_files() -> tuple[pathlib.Path, pathlib.Path]:
    """Write genome.fa and reads.fa if missing; return their paths."""
    ROOT.mkdir(exist_ok=True)
    gfa, rfa = ROOT / "genome.fa", ROOT / "reads.fa"
    if not gfa.exists():
        seq = genome_seq()
        with open(gfa, "w") as f:
            f.write(">chr1\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")
    if not rfa.exists():
        seq = genome_seq()
        starts, strands, subs = read_plan()
        comp = str.maketrans("ACGT", "TGCA")
        with open(rfa, "w") as f:
            for i in range(N_READS):
                s = list(seq[starts[i]:starts[i] + READ_LEN])
                for j, b in subs[i]:
                    s[j] = b
                s = "".join(s)
                if strands[i]:
                    s = s.translate(comp)[::-1]
                f.write(f">r{i}\n{s}\n")
    return gfa, rfa


def read_plan():
    """Deterministic (starts, strands, substitutions) for all reads."""
    rng = np.random.default_rng(1)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, N_READS)
    strands = rng.random(N_READS) < 0.5
    subs = []
    for i in range(N_READS):
        nsub = rng.binomial(READ_LEN, SUB_RATE)
        subs.append([(int(rng.integers(0, READ_LEN)),
                      "ACGT"[int(rng.integers(0, 4))]) for _ in range(nsub)])
    return starts, strands, subs
