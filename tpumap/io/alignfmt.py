"""GMAP summary (-S) and alignment (-A) text formats.

Byte-format analog of the reference's default output (src/pair.c
Pair_print_pathsummary / Pair_print_alignment; golden:
tests/align.test.ok). The alignment is rendered over a unified column
stream: one column per aligned query/genome base plus a fixed 9-column
marker per intron (3 donor bases, '...', 3 acceptor bases; '>>>...>>>'
match row; intron length centered in the query row), wrapped in 50-column
blocks of ruler / aa.g / genome / match / query / aa.c rows.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tpumap.gmap.engine import ExonChain
from tpumap.gmap.translation import best_orf, translate_codes
from tpumap.utils import dna

BLOCK = 50
RULER = ""
for _c in range(1, BLOCK + 1):
    if _c % 10 == 5:
        RULER += "."
    elif _c % 10 == 0:
        RULER += ":"
    else:
        RULER += " "


def commafmt(n: int) -> str:
    return f"{n:,}"


@dataclass
class Column:
    gchar: str = " "
    qchar: str = " "
    mchar: str = " "
    gpos: int = -1       # 1-based genomic coordinate or -1
    qpos: int = -1       # 1-based query coordinate (original orientation)
    aag: str = " "
    aac: str = " "
    aanum: int = -1      # aa index if an aa letter sits here


def build_columns(chain: ExonChain, query_codes: np.ndarray,
                  region_codes: np.ndarray, genome_offset: int = 0,
                  orf=None) -> list[Column]:
    """Column stream for one path.

    query_codes: ALIGNED orientation codes. genome_offset: added to region
    coords for display (univcoord/chrpos base). orf: optional (qs, qe, aa)
    from best_orf on the aligned query.
    """
    qlen = len(query_codes)
    cols: list[Column] = []
    # amino acid placement: letter at the middle base of each codon
    aag_by_q = {}
    aac_by_q = {}
    aanum_by_q = {}
    if orf is not None:
        orf_s, orf_e, _ = orf
        # genomic-side codes along the query positions
        gside = np.zeros(qlen, dtype=np.uint8)
        covered = np.zeros(qlen, dtype=bool)
        for e in chain.exons:
            span = e.qend - e.qstart
            gside[e.qstart:e.qend] = region_codes[e.gstart:e.gend]
            covered[e.qstart:e.qend] = True
        n_aa = (orf_e - orf_s) // 3
        for a in range(n_aa):
            qpos = orf_s + 3 * a
            if qpos + 2 >= qlen:
                break
            # the reference prints the aa letter at the codon's first base
            aac_by_q[qpos] = translate_codes(query_codes[qpos:qpos + 3])
            if covered[qpos:qpos + 3].all():
                aag_by_q[qpos] = translate_codes(gside[qpos:qpos + 3])
            else:
                aag_by_q[qpos] = aac_by_q[qpos]
            aanum_by_q[qpos] = a + 1

    for i, e in enumerate(chain.exons):
        if i > 0:
            prev = chain.exons[i - 1]
            ilen = e.gstart - prev.gend
            if ilen > 0:
                label = str(ilen)
                pad = (9 - len(label)) // 2
                lab = " " * pad + label + " " * (9 - pad - len(label))
                gleft = [dna.BASES[region_codes[prev.gend + j]] for j in range(3)] \
                    if prev.gend + 3 <= len(region_codes) else ["N"] * 3
                gright = [dna.BASES[region_codes[e.gstart - 3 + j]] for j in range(3)] \
                    if e.gstart - 3 >= 0 else ["N"] * 3
                gchars = gleft + ["."] * 3 + gright
                gposs = ([prev.gend + 1 + j for j in range(3)] + [-1] * 3
                         + [e.gstart - 2 + j for j in range(3)])
                for j in range(9):
                    cols.append(Column(gchar=gchars[j], qchar=lab[j],
                                       mchar=">>>...>>>"[j],
                                       gpos=(gposs[j] + genome_offset
                                             if gposs[j] > 0 else -1)))
        for q in range(e.qstart, e.qend):
            g = e.gstart + (q - e.qstart)
            gc = dna.BASES[region_codes[g]]
            qc = dna.BASES[query_codes[q]]
            cols.append(Column(
                gchar=gc, qchar=qc, mchar="|" if gc == qc else " ",
                gpos=g + 1 + genome_offset, qpos=q + 1,
                aag=aag_by_q.get(q, " "), aac=aac_by_q.get(q, " "),
                aanum=aanum_by_q.get(q, -1)))
    return cols


def render_blocks(cols: list[Column]) -> str:
    out = []
    for start in range(0, len(cols), BLOCK):
        blk = cols[start:start + BLOCK]
        gnum = next((c.gpos for c in blk if c.gpos > 0), 0)
        qnum = next((c.qpos for c in blk if c.qpos > 0), 0)
        aagnum = next((c.aanum for c in blk if c.aanum > 0), 0)
        aacnum = aagnum
        # every row is a fixed-width buffer (15 + block) — the reference
        # keeps all trailing spaces; aa rows drop their prefix entirely
        # when the block contains no amino-acid letter
        ruler = f"{start:>14} " + RULER[:len(blk)]
        aagl = (f"aa.g{aagnum:>10} " if aagnum else " " * 15) + \
            "".join(c.aag for c in blk)
        genome = f"{gnum:>14} " + "".join(c.gchar for c in blk)
        match = " " * 15 + "".join(c.mchar for c in blk)
        query = f"{qnum:>14} " + "".join(c.qchar for c in blk)
        aacl = (f"aa.c{aacnum:>10} " if aacnum else " " * 15) + \
            "".join(c.aac for c in blk)
        out.append("\n".join([ruler, aagl, genome, match, query, aacl]))
    return "\n\n".join(out) + "\n\n"


def exon_summary_lines(chain: ExonChain, genome_offset: int = 0) -> str:
    lines = []
    for i, e in enumerate(chain.exons):
        total = e.qend - e.qstart
        pct = round(100 * e.matches / total) if total else 100
        line = (f"    {e.gstart + 1 + genome_offset}-{e.gend + genome_offset}"
                f"  ({e.qstart + 1}-{e.qend})   {pct}%")
        if i < len(chain.introns):
            intr = chain.introns[i]
            if intr.kind == "intron":
                arrow = {1: "->", -1: "<-", 0: "=="}[chain.cdna_direction]
                line += (f" {arrow}   ...{intr.length}...  "
                         f"{intr.donor_prob:.3f}, {intr.acceptor_prob:.3f}")
        lines.append(line)
    return "\n".join(lines) + "\n"


def path_summary(chain: ExonChain, qlen: int, chrname: str | None,
                 genome_offset: int, pathnum: int = 1,
                 orf=None, aa_changes: str = "") -> str:
    g_lo = chain.exons[0].gstart + 1 + genome_offset
    g_hi = chain.exons[-1].gend + genome_offset
    q_lo = chain.exons[0].qstart + 1
    q_hi = chain.exons[-1].qend
    if chain.strand:
        q_lo, q_hi = qlen - q_hi + 1, qlen - q_lo + 1
    gspan = g_hi - g_lo + 1
    strand = "-" if chain.strand else "+"
    dirname = {1: "sense", -1: "antisense", 0: "indeterminate"}[
        chain.cdna_direction * (-1 if chain.strand else 1)]
    matches, mm = chain.matches, chain.mismatches
    denom = max(matches + mm, 1)
    cov = 100.0 * (chain.exons[-1].qend - chain.exons[0].qstart) / max(qlen, 1)
    trimmed_len = chain.exons[-1].qend - chain.exons[0].qstart
    lines = [
        f"  Path {pathnum}: query {q_lo}..{q_hi} ({qlen} bp) => genome "
        f"{commafmt(g_lo)}..{commafmt(g_hi)} ({gspan} bp)",
        f"    cDNA direction: {dirname}",
        (f"    Genomic pos: {chrname + ':' if chrname else ''}"
         f"{commafmt(g_lo)}..{commafmt(g_hi)} ({strand} strand)"),
        f"    Number of exons: {len(chain.exons)}",
        f"    Coverage: {cov:.1f} (query length: {qlen} bp)",
        (f"    Trimmed coverage: {cov:.1f} (trimmed length: {trimmed_len} bp, "
         f"trimmed region: {q_lo}..{q_hi})"),
        (f"    Percent identity: {100.0 * matches / denom:.1f} "
         f"({matches} matches, {mm} mismatches, 0 indels, 0 unknowns)"),
    ]
    if orf is not None:
        orf_s, orf_e, aa = orf
        lines.append(f"    Translation: {orf_s + 1}..{orf_e} ({len(aa)} aa)")
        lines.append(f"    Amino acid changes: {aa_changes}")
    return "\n".join(lines) + "\n"


def print_alignment(header: str, chain: ExonChain, query_codes_aligned,
                    region_codes, qlen: int, chrname: str | None = None,
                    genome_offset: int = 0, summary_only: bool = False) -> str:
    """Full -A (or -S with summary_only) text for one query, one path."""
    orf = best_orf(np.asarray(query_codes_aligned))
    parts = [f">{header}\n", "Paths (1):\n"]
    parts.append(path_summary(chain, qlen, chrname, genome_offset, orf=orf))
    parts.append("\nAlignments:\n  Alignment for path 1:\n\n")
    parts.append(exon_summary_lines(chain, genome_offset))
    if summary_only:
        parts.append("\n")
        return "".join(parts)
    parts.append("\n")
    cols = build_columns(chain, np.asarray(query_codes_aligned),
                         np.asarray(region_codes), genome_offset, orf=orf)
    parts.append(render_blocks(cols))
    return "".join(parts)
