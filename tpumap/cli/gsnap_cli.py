"""tpumap-gsnap: short-read alignment CLI.

Mirrors the behaviorally-meaningful subset of the reference gsnap flags
(src/gsnap.c:581-742): -D/-d database, -A output format (sam/m8),
-N novel splicing, --pairmax-dna/rna insert window, single or paired
input files, --batch-size for the device batch.
"""
from __future__ import annotations

import argparse
import sys

from tpumap.gsnap.driver import align_records
from tpumap.gsnap.engine import AlignConfig
from tpumap.gsnap.paired import align_paired_records
from tpumap.index.build import GenomeDB
from tpumap.index.device import DeviceIndex
from tpumap.io import sam
from tpumap.io.fasta import read_seqs


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(prog="tpumap-gsnap")
    ap.add_argument("-D", "--dir", required=True, help="database directory")
    ap.add_argument("-d", "--db", help="database name (informational)")
    ap.add_argument("-A", "--format", default="sam", choices=["sam", "m8"])
    ap.add_argument("-N", "--novelsplicing", type=int, default=0)
    ap.add_argument("-c", "--use-transcriptome", dest="use_transcriptome",
                    help="transcriptome index name (built with "
                         "tpumap-trindex) for transcriptome-guided "
                         "alignment")
    ap.add_argument("-s", "--use-splicing", dest="use_splicing",
                    help="known splice sites/introns map (.iit from "
                         "iit_store, or .npz from --splices-dump)")
    ap.add_argument("-v", "--use-snps", dest="use_snps", action="store_true",
                    help="SNP-tolerant alignment (db must be prepared with "
                         "tpumap-snpindex)")
    ap.add_argument("--mode", default="standard",
                    choices=["standard", "cmet-stranded", "atoi-stranded",
                             "ttoc-stranded"])
    ap.add_argument("--two-pass", action="store_true", dest="two_pass",
                    help="learn splice sites in pass 1, realign in pass 2")
    ap.add_argument("--splices-dump", dest="splices_dump",
                    help="write learned splice sites (.npz) after pass 1")
    ap.add_argument("--splices-read", dest="splices_read",
                    help="read previously learned splice sites (.npz)")
    ap.add_argument("--pairmax", type=int, default=2000)
    ap.add_argument("--max-intron", type=int, default=200_000)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--no-sam-headers", action="store_true")
    ap.add_argument("reads", help="FASTA/FASTQ file (read 1)")
    ap.add_argument("reads2", nargs="?", help="read-2 file for paired-end")
    args = ap.parse_args(argv)

    db = GenomeDB.load(args.dir)
    index = DeviceIndex.from_host(db)
    out = sys.stdout
    if args.use_snps and (db.mode_indexes is None
                          or "snp" not in db.mode_indexes):
        sys.stderr.write("error: -v requires a SNP-tolerant database "
                         "(run tpumap-snpindex first)\n")
        return 2
    config = AlignConfig(mode=args.mode, snp_tolerant=args.use_snps)

    tr = None
    if args.use_transcriptome:
        import os
        from tpumap.gsnap.transcriptome import Transcriptome
        trdir = os.path.join(args.dir, f"{db.name}.transcripts",
                             args.use_transcriptome)
        transcriptome = Transcriptome.load(trdir)
        tr = (transcriptome, DeviceIndex.from_host(transcriptome.trdb))

    known = None
    if args.splices_read:
        from tpumap.gsnap.knownsplicing import KnownSplicing
        known = KnownSplicing.load(args.splices_read)
    if args.use_splicing:
        from tpumap.gsnap.knownsplicing import KnownSplicing
        if args.use_splicing.endswith(".npz"):
            ks = KnownSplicing.load(args.use_splicing)
        else:
            from tpumap.io.iit import IIT
            ks = KnownSplicing.from_splicing_iit(IIT.read(args.use_splicing), db)
        known = ks

    if args.format == "sam" and not args.no_sam_headers:
        out.write(sam.header(db, "tpumap-gsnap " + " ".join(argv)))

    if args.reads2:
        pairs = list(zip(read_seqs(args.reads), read_seqs(args.reads2)))
        for s1, s2 in align_paired_records(db, index, pairs, config,
                                           pairmax=args.pairmax,
                                           batch_size=args.batch_size):
            out.write(s1.line() + "\n")
            out.write(s2.line() + "\n")
        return

    records = list(read_seqs(args.reads))
    if args.two_pass:
        from tpumap.gsnap.twopass import two_pass_align
        results, _ks = two_pass_align(db, index, records, config,
                                      max_intron=args.max_intron,
                                      batch_size=args.batch_size,
                                      splices_dump=args.splices_dump, tr=tr)
    else:
        results = align_records(db, index, records, config,
                                novelsplicing=bool(args.novelsplicing),
                                max_intron=args.max_intron,
                                batch_size=args.batch_size, known=known,
                                tr=tr)
    if args.format == "m8":
        from tpumap.io.m8 import m8_line
        for rec, s in zip(records, results):
            if s.flag & 4:
                continue
            nm = next((int(t.split(":")[2]) for t in s.tags
                       if t.startswith("NM:i:")), 0)
            diag = int(db.chrom_offsets[db.chrom_names.index(s.rname)]) + s.pos - 1
            out.write(m8_line(db, rec.accession, diag,
                              1 if s.flag & 16 else 0, len(rec.sequence), nm)
                      + "\n")
    else:
        for s in results:
            out.write(s.line() + "\n")


if __name__ == "__main__":
    main()
