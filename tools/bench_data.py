"""Shared benchmark workload generation (deterministic).

Used by bench.py (tpumap) and tools/measure_baseline.py (reference gsnap)
so both time exactly the same genome + reads.

Two workloads over one chr21-scale genome (46.7 Mbp — the size of human
chr21, per BASELINE.md's own plan):

* DNA: 100 bp reads, 1% substitutions (the round-1 workload, now at
  chr21 scale with a k=14 index for real HBM pressure);
* RNA: 40% of reads span 1-2 GT..AG introns from a planted gene set
  (exercises the splice/chain path; VERDICT round-1 "no spliced-read
  benchmark" gap).  Genes carry a SHORT (~32 bp) second exon so a 100 bp
  read can hold two junctions — the reference's hard multi-junction case
  (path-solve.c combine_leftright_paths).
"""
from __future__ import annotations

import pathlib

import numpy as np

ROOT = pathlib.Path("/tmp/tpumap_bench")
GENOME_LEN = 46_700_000
N_READS = 50_000
READ_LEN = 100
SUB_RATE = 0.01

# planted gene set: exon lengths [300, ~32, 300, 300] with GT..AG introns
N_GENES = 400
EXON_LEN = 300
INTRON_CHOICES = (200, 1000, 5000, 20000)
RNA_SPLICED_FRAC = 0.4


def gene_table():
    """[[(exon_start, exon_len), ...]] — deterministic, non-overlapping.

    Exon 1 is short (25-40 bp) so 100 bp reads can span two junctions.
    """
    rng = np.random.default_rng(7)
    genes = []
    span = GENOME_LEN // N_GENES
    for g in range(N_GENES):
        pos = g * span + 1000
        exons = []
        for ln in (EXON_LEN, int(rng.integers(25, 41)), EXON_LEN, EXON_LEN):
            exons.append((pos, ln))
            pos += ln + int(INTRON_CHOICES[int(
                rng.integers(0, len(INTRON_CHOICES)))])
        genes.append(exons)
    return genes


def genome_codes() -> np.ndarray:
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, GENOME_LEN, dtype=np.int8)
    # plant canonical GT..AG dinucleotides at every gene's intron bounds
    for exons in gene_table():
        for i in range(len(exons) - 1):
            a = exons[i][0] + exons[i][1]          # first intron base
            b = exons[i + 1][0]                    # first base after intron
            codes[a], codes[a + 1] = 2, 3          # GT
            codes[b - 2], codes[b - 1] = 0, 2      # AG
    return codes


def _codes_to_str(codes: np.ndarray) -> str:
    return codes.astype(np.uint8).tobytes().translate(
        bytes.maketrans(b"\x00\x01\x02\x03", b"ACGT")).decode()


def ensure_files() -> tuple[pathlib.Path, pathlib.Path]:
    """Write genome.fa and DNA reads.fa if missing; return their paths."""
    ROOT.mkdir(exist_ok=True)
    gfa, rfa = ROOT / "genome.fa", ROOT / "reads.fa"
    if not gfa.exists():
        seq = _codes_to_str(genome_codes())
        with open(gfa, "w") as f:
            f.write(">chr1\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")
    if not rfa.exists():
        _write_dna_reads(rfa)
    return gfa, rfa


def ensure_rna_files() -> tuple[pathlib.Path, pathlib.Path]:
    """Genome + RNA reads (spliced fraction per RNA_SPLICED_FRAC)."""
    gfa, _ = ensure_files()
    rfa = ROOT / "reads_rna.fa"
    if not rfa.exists():
        _write_rna_reads(rfa)
    return gfa, rfa


def _write_dna_reads(rfa):
    codes = genome_codes()
    starts, strands, subs = read_plan()
    with open(rfa, "w") as f:
        for i in range(N_READS):
            s = codes[starts[i]:starts[i] + READ_LEN].copy()
            for j, b in subs[i]:
                s[j] = b
            if strands[i]:
                s = 3 - s[::-1]
            f.write(f">r{i}\n{_codes_to_str(s)}\n")


def read_plan():
    """Deterministic (starts, strands, substitutions) for the DNA reads."""
    rng = np.random.default_rng(1)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, N_READS)
    strands = rng.random(N_READS) < 0.5
    subs = []
    for i in range(N_READS):
        nsub = rng.binomial(READ_LEN, SUB_RATE)
        subs.append([(int(rng.integers(0, READ_LEN)),
                      int(rng.integers(0, 4))) for _ in range(nsub)])
    return starts, strands, subs


def rna_read_plan():
    """Deterministic plan for RNA reads.

    Returns a list of dicts: {"segs": [(gpos, len), ...], "strand": 0/1,
    "subs": [(qpos, code), ...]} — segs are genome intervals concatenated
    to form the read (1 seg = unspliced, 2-3 segs = 1-2 junctions).
    """
    rng = np.random.default_rng(2)
    genes = gene_table()
    plan = []
    for i in range(N_READS):
        spliced = rng.random() < RNA_SPLICED_FRAC
        if not spliced:
            p = int(rng.integers(0, GENOME_LEN - READ_LEN))
            segs = [(p, READ_LEN)]
        else:
            exons = genes[int(rng.integers(0, N_GENES))]
            if rng.random() < 0.25:
                # two junctions across the short exon 1
                s1, l1 = exons[1]
                l0 = int(rng.integers(20, READ_LEN - l1 - 20))
                l2 = READ_LEN - l0 - l1
                segs = [(exons[0][0] + exons[0][1] - l0, l0),
                        (s1, l1),
                        (exons[2][0], l2)]
            else:
                e0 = int(rng.integers(0, 3))
                if e0 == 1:
                    e0 = 2                     # skip the short exon here
                l0 = int(rng.integers(20, 80))
                segs = [(exons[e0][0] + exons[e0][1] - l0, l0),
                        (exons[e0 + 1][0], READ_LEN - l0)]
        nsub = rng.binomial(READ_LEN, SUB_RATE)
        subs = [(int(rng.integers(0, READ_LEN)), int(rng.integers(0, 4)))
                for _ in range(nsub)]
        plan.append({"segs": segs, "strand": int(rng.random() < 0.5),
                     "subs": subs})
    return plan


def rna_truth():
    """Per-read truth from the RNA plan: (junction set, locus start).

    Junctions are genomic (donor_univcoord, acceptor_univcoord) pairs
    with donor = first intron base and acceptor = first exon base after
    the intron; locus start = leftmost genomic coordinate."""
    out = []
    for p in rna_read_plan():
        segs = p["segs"]
        js = {(a + n, b) for (a, n), (b, _n2) in zip(segs, segs[1:])}
        out.append((js, segs[0][0]))
    return out


# paired-end workload: DNA fragments, FR orientation (BASELINE.md row 4)
PE_N_PAIRS = 20_000
PE_FRAG_MEAN, PE_FRAG_SD = 350, 40


def pe_read_plan():
    """Deterministic paired-end plan: (frag_start, frag_len, subs1, subs2)."""
    rng = np.random.default_rng(5)
    plan = []
    for i in range(PE_N_PAIRS):
        fl = int(np.clip(rng.normal(PE_FRAG_MEAN, PE_FRAG_SD),
                         2 * READ_LEN, PE_FRAG_MEAN + 4 * PE_FRAG_SD))
        start = int(rng.integers(0, GENOME_LEN - fl))
        subs1 = [(int(rng.integers(0, READ_LEN)), int(rng.integers(0, 4)))
                 for _ in range(rng.binomial(READ_LEN, SUB_RATE))]
        subs2 = [(int(rng.integers(0, READ_LEN)), int(rng.integers(0, 4)))
                 for _ in range(rng.binomial(READ_LEN, SUB_RATE))]
        plan.append((start, fl, subs1, subs2))
    return plan


def ensure_pe_files():
    """reads_pe_1.fa / reads_pe_2.fa: FR pairs from the bench genome."""
    ensure_files()
    f1, f2 = ROOT / "reads_pe_1.fa", ROOT / "reads_pe_2.fa"
    if f1.exists() and f2.exists():
        return f1, f2
    codes = genome_codes()
    with open(f1, "w") as o1, open(f2, "w") as o2:
        for i, (start, fl, subs1, subs2) in enumerate(pe_read_plan()):
            s1 = codes[start:start + READ_LEN].copy()
            for j, b in subs1:
                s1[j] = b
            s2 = codes[start + fl - READ_LEN:start + fl].copy()
            for j, b in subs2:
                s2[j] = b
            s2 = 3 - s2[::-1]                    # mate 2 is reverse strand
            o1.write(f">p{i}/1\n{_codes_to_str(s1)}\n")
            o2.write(f">p{i}/2\n{_codes_to_str(s2)}\n")
    return f1, f2


def _write_rna_reads(rfa):
    codes = genome_codes()
    plan = rna_read_plan()
    with open(rfa, "w") as f:
        for i, p in enumerate(plan):
            s = np.concatenate([codes[a:a + n] for a, n in p["segs"]])
            for j, b in p["subs"]:
                s[j] = b
            if p["strand"]:
                s = 3 - s[::-1]
            nj = len(p["segs"]) - 1
            f.write(f">q{i}_{nj}\n{_codes_to_str(s)}\n")
