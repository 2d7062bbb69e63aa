"""SAM output (host side).

Capability analog of src/path-print-sam.c (Path_print_sam) + samheader.c.
Takes finished alignment records and prints SAM lines; CIGAR/MD/NM are
computed from the alignment structure plus the host genome.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from tpumap.index.build import GenomeDB
from tpumap.utils import dna


@dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str = "*"
    pos: int = 0               # 1-based
    mapq: int = 0
    cigar: str = "*"
    rnext: str = "*"
    pnext: int = 0
    tlen: int = 0
    seq: str = "*"
    qual: str = "*"
    tags: list[str] = field(default_factory=list)

    def line(self) -> str:
        cols = [self.qname, str(self.flag), self.rname, str(self.pos),
                str(self.mapq), self.cigar, self.rnext, str(self.pnext),
                str(self.tlen), self.seq, self.qual] + self.tags
        return "\t".join(cols)


def header(db: GenomeDB, program_args: str = "", rg: str | None = None,
           sort_order: str = "unsorted") -> str:
    lines = [f"@HD\tVN:1.6\tSO:{sort_order}"]
    for i, name in enumerate(db.chrom_names):
        length = int(db.chrom_offsets[i + 1] - db.chrom_offsets[i])
        lines.append(f"@SQ\tSN:{name}\tLN:{length}")
    if rg:
        lines.append(f"@RG\tID:{rg}")
    lines.append(f"@PG\tID:tpumap\tPN:tpumap\tVN:0.1.0\tCL:{program_args}")
    return "\n".join(lines) + "\n"


def md_and_nm(read_seq: str, genome_seq: str) -> tuple[str, int]:
    """MD tag + NM count for an ungapped alignment."""
    md, run, nm = [], 0, 0
    for r, g in zip(read_seq, genome_seq):
        if r == g and r != "N" and g != "N":
            run += 1
        else:
            md.append(str(run))
            md.append(g)
            run = 0
            nm += 1
    md.append(str(run))
    return "".join(md), nm


def unmapped_record(qname: str, seq: str, qual: str | None) -> SamRecord:
    return SamRecord(qname=qname, flag=4, seq=seq, qual=qual or "*")


def ungapped_record(db: GenomeDB, qname: str, seq: str, qual: str | None,
                    diag: int, strand: int, mapq: int,
                    nmismatch: int) -> SamRecord:
    """SAM record for a full-length ungapped (substitution-only) alignment.

    diag = univcoord of query base 0 in the aligned orientation; strand 1
    means the read aligned as its reverse complement.
    """
    L = len(seq)
    rname, chrpos = db.chrpos(diag)
    oriented = dna.revcomp(seq) if strand else seq
    genome_seq = db.get_seq(diag, L)
    md, nm = md_and_nm(oriented, genome_seq)
    flag = 16 if strand else 0
    q = qual or "*"
    if strand and qual:
        q = qual[::-1]
    return SamRecord(
        qname=qname, flag=flag, rname=rname, pos=chrpos + 1, mapq=mapq,
        cigar=f"{L}M", seq=oriented, qual=q,
        tags=[f"NM:i:{nm}", f"MD:Z:{md}"])
