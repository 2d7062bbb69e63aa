"""cDNA translation / ORF detection (host side).

Capability analog of src/translation.c (Translation_via_genomic): find the
best open reading frame of the aligned cDNA and report its query span, used
by the summary output ("Translation: 2..4006 (1334 aa)") and the GFF3 CDS
rows. The reference picks the longest stop-free codon run across the three
frames (not requiring ATG); ties go to the earlier start.
"""
from __future__ import annotations

import numpy as np

CODON_TABLE = {}
_BASES = "ACGT"
_AA = (
    "KNKN" "TTTT" "RSRS" "IIMI"   # AAA AAC AAG AAT ... (indexed differently below)
)

# build codon -> aa with the standard table
_STANDARD = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def translate_codes(codes: np.ndarray) -> str:
    """2-bit codes -> aa string (length len//3)."""
    out = []
    for i in range(0, len(codes) - 2, 3):
        codon = _BASES[codes[i]] + _BASES[codes[i + 1]] + _BASES[codes[i + 2]]
        out.append(_STANDARD[codon])
    return "".join(out)


def best_orf(codes: np.ndarray) -> tuple[int, int, str]:
    """Longest stop-free ORF across 3 frames.

    Returns (qstart, qend) as a 0-based half-open query span covering whole
    codons plus the terminating stop codon if present, and the aa string
    (stop excluded) — matching the reference's reported span (e.g.
    "Translation: 2..4006 (1334 aa)" counts the stop codon in the span but
    not in the aa count).
    """
    best = (0, 0, "")
    L = len(codes)
    for frame in range(3):
        aa = translate_codes(codes[frame:])
        # longest run without '*'
        start = 0
        i = 0
        runs = []
        for i, c in enumerate(aa + "*"):
            if c == "*":
                if i > start:
                    runs.append((start, i))
                start = i + 1
        for (s, e) in runs:
            qs = frame + 3 * s
            qe = frame + 3 * e
            has_stop = e < len(aa) and aa[e] == "*"
            qe_span = qe + 3 if has_stop else qe
            if (e - s) > (len(best[2])):
                best = (qs, qe_span, aa[s:e])
    return best
