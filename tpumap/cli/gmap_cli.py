"""tpumap-gmap: cDNA/mRNA -> genome spliced alignment CLI.

Mirrors the behaviorally-meaningful subset of the reference gmap flags
(src/gmap.c:515-630): -g/--gseg (align against a raw genomic segment),
-D/-d (database), -f (output format: 2=gff3_gene, 3=gff3_match_cdna).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from tpumap.gmap.engine import GmapConfig, align_cdna_both
from tpumap.io import gff3
from tpumap.io.fasta import read_fasta
from tpumap.utils import dna


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(prog="tpumap-gmap")
    ap.add_argument("-g", "--gseg", help="align against this genomic segment FASTA")
    ap.add_argument("-D", "--dir", help="genome database directory")
    ap.add_argument("-f", "--format", default="3",
                    choices=["2", "3", "gff3_gene", "gff3_match_cdna"])
    ap.add_argument("queries", help="query FASTA/FASTQ")
    args = ap.parse_args(argv)

    out = sys.stdout
    cmdline = "tpumap-gmap " + " ".join(argv)
    fmt = {"2": "gff3_gene", "3": "gff3_match_cdna"}.get(args.format,
                                                         args.format)
    out.write(gff3.header(cmdline))

    if args.gseg:
        region = next(read_fasta(args.gseg))
        rcodes, rnmask = dna.encode(region.sequence)
        config = GmapConfig()
        for rec in read_fasta(args.queries):
            qcodes, qnmask = dna.encode(rec.sequence)
            chain = align_cdna_both(qcodes, qnmask, rcodes, rnmask, config)
            if chain is None:
                continue
            if fmt == "gff3_match_cdna":
                out.write(gff3.match_cdna(chain, rec.accession,
                                          region.accession, region.accession))
            else:
                out.write(gff3.gene(chain, rec.accession, region.accession,
                                    region.accession, query_codes=qcodes))
    else:
        ap.error("database mode (-D/-d) arrives with the GMAP stage-1 "
                 "milestone; use -g for now")


if __name__ == "__main__":
    main()
