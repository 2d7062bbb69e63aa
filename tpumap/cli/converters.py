"""Annotation-format converters: GFF3/GTF/PSL -> map-file text for
iit_store, plus VCF -> SNP map.

Mirror of the reference Perl tools (util/gff3_splicesites.pl,
gff3_introns.pl, gff3_genes.pl, gtf_*.pl, psl_*.pl, vcf_iit.pl): each
reads an annotation file and prints iit_store FASTA-format map entries.
Output conventions (1-based inclusive coordinates):

* splicesites: ">GENE.TR.exonI/N chr:d..d+1 donor LEN" with d = last exon
  base, and ">GENE.TR.exonI+1/N chr:a-1..a acceptor LEN" with a = first
  base of the next exon; coordinates reversed on the minus strand
  (util/gff3_splicesites.pl.in:403-404,458-459).
* introns: ">GENE.TR.intronI/N chr:end..start" spanning last exon base ..
  first next-exon base (util/gff3_introns.pl.in:402).
* genes: ">transcript chr:start..end\\ngene_name gene_id\\n<exon lines>"
  (util/gff3_genes.pl.in:407-427) — the trindex input.
"""
from __future__ import annotations

import re
import sys
from dataclasses import dataclass, field


@dataclass
class Tx:
    transcript_id: str          # splicesites/introns label part 2 (feature ID)
    gene_label: str             # splicesites/introns label part 1 (gene ID)
    tx_label: str               # genes-format header label (transcript_id attr)
    gene_line2: str             # genes-format second line ("gene_name gene_id")
    chrom: str
    strand: str
    exons: list = field(default_factory=list)   # [(start, end)] 1-based

    def sorted_exons(self):
        """Exons in transcription order."""
        ex = sorted(self.exons)
        return ex[::-1] if self.strand == "-" else ex


def _attr_gff3(attrs: str) -> dict:
    out = {}
    for kv in attrs.strip().split(";"):
        kv = kv.strip()
        if "=" in kv:
            k, v = kv.split("=", 1)
            out[k] = v
    return out


def _attr_gtf(attrs: str) -> dict:
    out = {}
    for m in re.finditer(r'(\w+)\s+"([^"]*)"', attrs):
        out[m.group(1)] = m.group(2)
    return out


def parse_gff3(fh):
    """Yield Tx records from GFF3 (gene/mRNA|transcript/exon features).

    Label conventions follow the reference Perl tools: splicesites/introns
    use the gene/transcript feature IDs (util/gff3_splicesites.pl.in:59,74);
    the genes format uses GENCODE-style gene_id/gene_name/transcript_id
    attributes when present (util/gff3_genes.pl.in print_gene/print_coords),
    falling back to the IDs.
    """
    genes = {}       # gene ID -> (gene_name attr, gene_id attr)
    txs: dict[str, Tx] = {}
    order: list[str] = []
    for line in fh:
        if line.startswith("#") or not line.strip():
            continue
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 9:
            continue
        chrom, _src, ftype, start, end, _score, strand, _phase, attrs = cols[:9]
        a = _attr_gff3(attrs)
        if ftype == "gene":
            gid = a.get("ID", "")
            genes[gid] = (a.get("gene_name", a.get("Name", gid)),
                          a.get("gene_id", gid))
        elif ftype in ("mRNA", "transcript") or ftype.endswith("RNA"):
            tid = a.get("ID", "")
            parent = a.get("Parent", "")
            gname, gid_attr = genes.get(parent, (parent or tid,
                                                 parent or tid))
            txs[tid] = Tx(transcript_id=tid, gene_label=parent or tid,
                          tx_label=a.get("transcript_id", tid),
                          gene_line2=f"{gname} {gid_attr}",
                          chrom=chrom, strand=strand)
            order.append(tid)
        elif ftype == "exon":
            for parent in a.get("Parent", "").split(","):
                if parent not in txs:
                    txs[parent] = Tx(transcript_id=parent,
                                     gene_label=parent, tx_label=parent,
                                     gene_line2=f"{parent} {parent}",
                                     chrom=chrom, strand=strand)
                    order.append(parent)
                txs[parent].exons.append((int(start), int(end)))
    for tid in order:
        if txs[tid].exons:
            yield txs[tid]


def parse_gtf(fh):
    """Yield Tx records from GTF (exon features grouped by transcript_id)."""
    txs: dict[str, Tx] = {}
    order: list[str] = []
    for line in fh:
        if line.startswith("#") or not line.strip():
            continue
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 9 or cols[2] != "exon":
            continue
        chrom, _s, _f, start, end, _sc, strand, _ph, attrs = cols[:9]
        a = _attr_gtf(attrs)
        tid = a.get("transcript_id", "")
        if tid not in txs:
            gid = a.get("gene_id", tid)
            gname = a.get("gene_name")
            # gtf_genes second line = cat of gene_id and gene_name
            # (util/gtf_genes: cat_info("gene_id","gene_name"))
            line2 = f"{gid} {gname}" if gname else gid
            txs[tid] = Tx(transcript_id=tid, gene_label=gid,
                          tx_label=tid, gene_line2=line2,
                          chrom=chrom, strand=strand)
            order.append(tid)
        txs[tid].exons.append((int(start), int(end)))
    for tid in order:
        yield txs[tid]


def parse_psl(fh):
    """Yield Tx records from PSL alignments (qName = transcript)."""
    for line in fh:
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 21 or not cols[0].isdigit():
            continue
        strand = cols[8][-1]
        qname, tname = cols[9], cols[13]
        sizes = [int(x) for x in cols[18].rstrip(",").split(",")]
        tstarts = [int(x) for x in cols[20].rstrip(",").split(",")]
        exons = [(ts + 1, ts + sz) for ts, sz in zip(tstarts, sizes)]
        yield Tx(transcript_id=qname, gene_label=qname, tx_label=qname,
                 gene_line2=qname, chrom=tname, strand=strand, exons=exons)


# ---------------------------------------------------------------------------
# emitters


def emit_splicesites(tx: Tx, out, ttype: str = "exon") -> None:
    ex = tx.sorted_exons()
    n = len(ex)
    base = f"{tx.gene_label}.{tx.transcript_id}.{ttype}"
    if tx.strand == "+":
        for i in range(n - 1):
            d = ex[i][1]                 # last exon base
            a = ex[i + 1][0]             # first base of next exon
            ilen = a - d - 1
            if ilen < 0:
                continue
            out.write(f">{base}{i + 1}/{n} {tx.chrom}:{d}..{d + 1} donor {ilen}\n")
            out.write(f">{base}{i + 2}/{n} {tx.chrom}:{a - 1}..{a} acceptor {ilen}\n")
    else:
        for i in range(n - 1):
            d = ex[i][0]                 # lowest coord of exon i (transcription order)
            a = ex[i + 1][1]
            ilen = d - a - 1
            if ilen < 0:
                continue
            out.write(f">{base}{i + 1}/{n} {tx.chrom}:{d}..{d - 1} donor {ilen}\n")
            out.write(f">{base}{i + 2}/{n} {tx.chrom}:{a + 1}..{a} acceptor {ilen}\n")


def emit_introns(tx: Tx, out, ttype: str = "exon") -> None:
    ex = tx.sorted_exons()
    n = len(ex)
    base = f"{tx.gene_label}.{tx.transcript_id}.intron"
    if tx.strand == "+":
        for i in range(n - 1):
            if ex[i + 1][0] - ex[i][1] - 1 >= 0:
                out.write(f">{base}{i + 1}/{n - 1} "
                          f"{tx.chrom}:{ex[i][1]}..{ex[i + 1][0]}\n")
    else:
        for i in range(n - 1):
            if ex[i][0] - ex[i + 1][1] - 1 >= 0:
                out.write(f">{base}{i + 1}/{n - 1} "
                          f"{tx.chrom}:{ex[i][0]}..{ex[i + 1][1]}\n")


def emit_genes(tx: Tx, out) -> None:
    ex = tx.sorted_exons()
    if tx.strand == "+":
        lo = ex[0][0]
        hi = ex[-1][1]
        out.write(f">{tx.tx_label} {tx.chrom}:{lo}..{hi}\n")
        out.write(tx.gene_line2 + "\n")
        for s, e in ex:
            out.write(f"{s} {e}\n")
    else:
        hi = ex[0][1]
        lo = ex[-1][0]
        out.write(f">{tx.tx_label} {tx.chrom}:{hi}..{lo}\n")
        out.write(tx.gene_line2 + "\n")
        for s, e in ex:
            out.write(f"{e} {s}\n")


def vcf_to_snps(fh, out) -> None:
    """VCF -> SNP map entries: >rsID chr:pos RA (ref/alt single bases),
    the vcf_iit/dbsnp_iit equivalent consumed by snpindex."""
    for line in fh:
        if line.startswith("#") or not line.strip():
            continue
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 5:
            continue
        chrom, pos, rsid, ref, alts = cols[0], cols[1], cols[2], cols[3], cols[4]
        if len(ref) != 1:
            continue
        for alt in alts.split(","):
            if len(alt) == 1 and alt in "ACGT" and ref in "ACGT" and alt != ref:
                label = rsid if rsid != "." else f"{chrom}_{pos}_{ref}{alt}"
                out.write(f">{label} {chrom}:{pos} {ref}{alt}\n")


# ---------------------------------------------------------------------------
# CLI mains


def _converter_main(parser_fn, emit_fn, prog, argv=None):
    import argparse
    ap = argparse.ArgumentParser(prog=prog)
    ap.add_argument("input", nargs="?", help="annotation file (default stdin)")
    args = ap.parse_args(argv)
    fh = open(args.input) if args.input else sys.stdin
    for tx in parser_fn(fh):
        emit_fn(tx, sys.stdout)
    if args.input:
        fh.close()
    return 0


def gff3_splicesites_main(argv=None):
    return _converter_main(parse_gff3, emit_splicesites,
                           "tpumap-gff3_splicesites", argv)


def gff3_introns_main(argv=None):
    return _converter_main(parse_gff3, emit_introns,
                           "tpumap-gff3_introns", argv)


def gff3_genes_main(argv=None):
    return _converter_main(parse_gff3, lambda tx, out: emit_genes(tx, out),
                           "tpumap-gff3_genes", argv)


def gtf_splicesites_main(argv=None):
    return _converter_main(parse_gtf, emit_splicesites,
                           "tpumap-gtf_splicesites", argv)


def gtf_introns_main(argv=None):
    return _converter_main(parse_gtf, emit_introns,
                           "tpumap-gtf_introns", argv)


def gtf_genes_main(argv=None):
    return _converter_main(parse_gtf, lambda tx, out: emit_genes(tx, out),
                           "tpumap-gtf_genes", argv)


def psl_splicesites_main(argv=None):
    return _converter_main(parse_psl, emit_splicesites,
                           "tpumap-psl_splicesites", argv)


def psl_introns_main(argv=None):
    return _converter_main(parse_psl, emit_introns,
                           "tpumap-psl_introns", argv)


def psl_genes_main(argv=None):
    return _converter_main(parse_psl, lambda tx, out: emit_genes(tx, out),
                           "tpumap-psl_genes", argv)


def vcf_iit_main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(prog="tpumap-vcf_iit")
    ap.add_argument("input", nargs="?")
    args = ap.parse_args(argv)
    fh = open(args.input) if args.input else sys.stdin
    vcf_to_snps(fh, sys.stdout)
    if args.input:
        fh.close()
    return 0
