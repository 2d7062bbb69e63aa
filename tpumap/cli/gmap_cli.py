"""tpumap-gmap: cDNA/mRNA -> genome spliced alignment CLI.

Mirrors the behaviorally-meaningful subset of the reference gmap flags
(src/gmap.c:515-630): -g/--gseg (align against a raw genomic segment),
-D/-d (genome database), -f (output format: 2=gff3_gene,
3=gff3_match_cdna).
"""
from __future__ import annotations

import argparse
import sys

from tpumap.cli._errors import clean_errors

import numpy as np

from tpumap.gmap.engine import GmapConfig, align_cdna, align_cdna_both
from tpumap.gmap.stage1 import Stage1Config, find_regions
from tpumap.index.build import GenomeDB
from tpumap.index.device import DeviceIndex
from tpumap.io import gff3
from tpumap.io.fasta import read_fasta
from tpumap.utils import dna


def chain_goodness(chain) -> int:
    if chain is None:
        return -(10 ** 9)
    return chain.matches - 3 * chain.mismatches


def align_query_paths(db: GenomeDB, index: DeviceIndex, qcodes, qnmask,
                      config: GmapConfig = GmapConfig(),
                      s1config: Stage1Config = Stage1Config(),
                      npaths: int = 1, known=None):
    """GMAP pipeline for one query: up to npaths region alignments ranked
    by goodness (gmap -n, src/gmap.c maxpaths_report).

    Returns [(chain, univ_offset), ...]; exon genome coordinates in each
    chain are region-relative, univ_offset converts to univcoords.
    """
    regions = find_regions(index, qcodes, qnmask, s1config)
    if npaths > 1:
        # tandem/nearby duplicates merge into one coarse diagonal cluster;
        # a second fine-slop clustering pass separates their placements
        from dataclasses import replace
        fine = find_regions(index, qcodes, qnmask,
                            replace(s1config,
                                    maxtotallen=max(4 * len(qcodes), 1000),
                                    top_regions=2 * npaths))
        regions = list(regions) + [r for r in fine if r not in regions]
    from tpumap.gmap.engine import align_cdna_regions

    def inputs_for(rs):
        return [(db.get_codes(gstart, gend - gstart),
                 db.get_nmask(gstart, gend - gstart).astype(bool),
                 strand, gstart)
                for (gstart, gend, weight, strand) in rs]

    paths = []
    # top-weight region first (one device call); a perfect hit makes the
    # remaining regions unnecessary for npaths=1 — the common case
    head = align_cdna_regions(qcodes, qnmask, inputs_for(regions[:1]),
                              config, known=known)
    if head and head[0] is not None and head[0].exons:
        paths.append((head[0], regions[0][0]))
    done = (npaths == 1 and paths
            and paths[0][0].mismatches == 0
            and paths[0][0].coverage == len(qcodes))
    if not done and len(regions) > 1:
        chains = align_cdna_regions(qcodes, qnmask,
                                    inputs_for(regions[1:]), config,
                                    known=known)
        for (gstart, _gend, _w, strand), chain in zip(regions[1:], chains):
            if chain is None or not chain.exons:
                continue
            paths.append((chain, gstart))
    paths.sort(key=lambda p: -chain_goodness(p[0]))
    # drop duplicate placements (same genomic span)
    seen, uniq = set(), []
    for chain, off in paths:
        key = (off + chain.exons[0].gstart, off + chain.exons[-1].gend,
               chain.strand)
        if key in seen:
            continue
        seen.add(key)
        uniq.append((chain, off))
    return uniq[:npaths]


def align_queries_bulk(db: GenomeDB, index: DeviceIndex, encoded: list,
                       config: GmapConfig = GmapConfig(),
                       s1config: Stage1Config = Stage1Config(),
                       known=None):
    """Best path for MANY queries with batched device calls: one stage-1
    call for the whole batch, then one chain call per (Qp, Rp) shape
    bucket — the per-call device latency otherwise dominates GMAP
    throughput. Returns [(chain, univ_off) | None] parallel to encoded
    [(codes, nmask)] queries."""
    from tpumap.gmap.engine import align_cdna_windows
    from tpumap.gmap.stage1 import find_regions_bulk

    regions_per_q = find_regions_bulk(index, encoded, s1config)

    def make_pair(qi, region):
        (gstart, gend, _w, strand) = region
        codes, nmask = encoded[qi]
        if strand:
            qq = dna.revcomp_codes(codes)
            nn = nmask[::-1]
        else:
            qq, nn = codes, nmask
        return (qq, nn, gstart, gend - gstart, strand)

    best = {}

    def run_round(work):            # work: list of (qi, region)
        # one device call per window-size group (on-device region
        # extraction; two groups bound the padding waste of the rare
        # wide regions without multiplying per-call dispatch overhead)
        small = [(qi, r) for qi, r in work if r[1] - r[0] <= 65536]
        wide = [(qi, r) for qi, r in work if r[1] - r[0] > 65536]
        for subset in (small, wide):
            if not subset:
                continue
            pairs = [make_pair(qi, r) for qi, r in subset]
            res = align_cdna_windows(index, db, pairs, config, known=known)
            for (qi, _r), p, ch in zip(subset, pairs, res):
                if ch is None or not ch.exons:
                    continue
                if (qi not in best
                        or chain_goodness(ch) > chain_goodness(best[qi][0])):
                    best[qi] = (ch, p[2])

    # round 1: top-weight region per query; a perfect alignment there
    # makes the remaining regions unnecessary (the reference's gregion
    # early exit) — the second round only runs for unsolved queries
    run_round([(qi, regs[0]) for qi, regs in enumerate(regions_per_q)
               if regs])
    rest = []
    for qi, regs in enumerate(regions_per_q):
        hit = best.get(qi)
        if hit is not None:
            qlen = len(encoded[qi][0])
            ch = hit[0]
            aligned = ch.matches + ch.mismatches
            # sufficiency threshold (the found_score early-exit concept,
            # src/stage1hr-single.c:1038): a near-perfect path makes the
            # lower-weight regions not worth refining
            if (ch.coverage >= 0.98 * qlen and aligned
                    and ch.matches >= 0.99 * aligned):
                continue
        rest.extend((qi, r) for r in regs[1:])
    if rest:
        run_round(rest)
    return [best.get(qi) for qi in range(len(encoded))]


def align_query_to_db(db: GenomeDB, index: DeviceIndex, qcodes, qnmask,
                      config: GmapConfig = GmapConfig(),
                      s1config: Stage1Config = Stage1Config()):
    """Best single path (see align_query_paths)."""
    paths = align_query_paths(db, index, qcodes, qnmask, config, s1config)
    return paths[0] if paths else (None, 0)


@clean_errors
def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(prog="tpumap-gmap")
    ap.add_argument("-g", "--gseg", help="align against this genomic segment FASTA")
    ap.add_argument("-D", "--dir", help="genome database directory")
    ap.add_argument("-d", "--db", help="genome database name (informational)")
    ap.add_argument("-f", "--format", default=None,
                    choices=["1", "psl", "2", "gff3_gene", "3",
                             "gff3_match_cdna", "4", "gff3_match_est",
                             "6", "splicesites", "introns", "samse", "sampe", "bedpe"])
    ap.add_argument("-A", "--align", action="store_true",
                    help="show alignment (text format)")
    ap.add_argument("-S", "--summary", action="store_true",
                    help="show summary of alignments (text format)")
    ap.add_argument("-E", "--exons", choices=["cdna", "genomic",
                                              "cdna+introns",
                                              "genomic+introns"])
    ap.add_argument("-P", "--protein_dna", action="store_true")
    ap.add_argument("-Q", "--protein_gen", action="store_true")
    ap.add_argument("--min-trimmed-coverage", dest="min_coverage",
                    type=float, default=0.0,
                    help="only report paths covering at least this "
                         "fraction of the query")
    ap.add_argument("--min-identity", dest="min_identity",
                    type=float, default=0.0,
                    help="only report paths with at least this identity")
    ap.add_argument("-s", "--use-splicing", dest="use_splicing",
                    help="known splice sites/introns map (.iit) biasing "
                         "intron placement")
    ap.add_argument("-n", "--npaths", type=int, default=1,
                    help="maximum number of paths to report per query")
    ap.add_argument("-I", "--invertmode", dest="invertmode", type=int,
                    default=0, choices=[0, 1, 2],
                    help="minus-strand display: 0 = original cDNA vs "
                         "genome (-) strand descending (default), "
                         "1 = inverted cDNA vs (-) strand text, "
                         "2 = inverted cDNA vs (+) strand text "
                         "(src/pair.c invertmode)")
    ap.add_argument("--wraplength", type=int, default=50,
                    help="alignment block width (default 50)")
    ap.add_argument("--nolengths", action="store_true",
                    help="omit intron lengths in the alignment display")
    ap.add_argument("--nomargin", action="store_true",
                    help="omit the left margin in -A output")
    ap.add_argument("--introngap", type=int, default=3,
                    help="intron-flank bases shown in the alignment "
                         "(default 3)")
    ap.add_argument("-x", "--chimera-margin", dest="chimera_margin",
                    type=int, default=0,
                    help="report chimeras when an uncovered query margin "
                         "of at least this size aligns elsewhere "
                         "(src/chimera.c; 0 disables)")
    ap.add_argument("queries", help="query FASTA/FASTQ")
    args = ap.parse_args(argv)

    out = sys.stdout
    cmdline = "tpumap-gmap " + " ".join(argv)
    if args.align:
        fmt = "align"
    elif args.summary:
        fmt = "summary"
    elif args.exons:
        fmt = "exons:" + args.exons
    elif args.protein_dna:
        fmt = "protein_dna"
    elif args.protein_gen:
        fmt = "protein_gen"
    else:
        fmt = {"1": "psl", "2": "gff3_gene", "3": "gff3_match_cdna",
               "4": "gff3_match_est", "6": "splicesites",
               None: "gff3_match_cdna"}.get(args.format, args.format)
    if fmt.startswith("gff3"):
        out.write(gff3.header(cmdline))

    def emit(chain, rec, qcodes, seqid, source, chrom_offset,
             region_codes=None, chrname=None, tsize=0):
        from tpumap.io import gmapfmt
        aligned = dna.revcomp_codes(qcodes) if chain.strand else qcodes
        if fmt == "gff3_match_cdna":
            out.write(gff3.match_cdna(chain, rec.accession, seqid, source,
                                      chrom_offset=chrom_offset,
                                      qlen=len(qcodes)))
        elif fmt == "gff3_gene":
            out.write(gff3.gene(chain, rec.accession, seqid, source,
                                query_codes=qcodes,
                                chrom_offset=chrom_offset,
                                qlen=len(qcodes)))
        elif fmt == "gff3_match_est":
            out.write(gmapfmt.est_match(chain, rec.accession, seqid, source,
                                        qlen=len(qcodes),
                                        chrom_offset=chrom_offset))
        elif fmt == "psl":
            out.write(gmapfmt.psl(chain, rec.accession, len(qcodes), seqid,
                                  tsize, chrom_offset=chrom_offset))
        elif fmt == "bedpe":
            from tpumap.utils import dna as dna_mod
            aligned_seq = dna_mod.decode(aligned,
                                         __import__("numpy").zeros(
                                             len(aligned), bool))
            out.write(gmapfmt.bedpe(chain, chrname or seqid,
                                    chrom_offset=chrom_offset,
                                    query_seq=aligned_seq))
        elif fmt == "splicesites":
            out.write(gmapfmt.splicesites(chain, rec.accession,
                                          chrname or "",
                                          chrom_offset=chrom_offset))
        elif fmt == "introns":
            out.write(gmapfmt.introns_fmt(chain, rec.accession,
                                          chrname or "",
                                          chrom_offset=chrom_offset))
        elif fmt in ("samse", "sampe"):
            out.write(gmapfmt.sam_se(chain, rec.accession, rec.sequence,
                                     rec.quality, seqid,
                                     chrom_offset=chrom_offset,
                                     qlen=len(qcodes),
                                     paired_flag=(fmt == "sampe"),
                                     region_codes=region_codes))
        elif fmt.startswith("exons:"):
            kind = fmt.split(":")[1]
            out.write(gmapfmt.exons_fmt(chain, rec.header, aligned,
                                        region_codes,
                                        genomic=kind.startswith("genomic"),
                                        with_introns="+introns" in kind))
        elif fmt in ("protein_dna", "protein_gen"):
            out.write(gmapfmt.protein_fmt(chain, rec.header, aligned,
                                          region_codes,
                                          genomic=(fmt == "protein_gen")))
        else:
            from tpumap.io.alignfmt import print_alignment
            aligned = dna.revcomp_codes(qcodes) if chain.strand else qcodes
            out.write(print_alignment(rec.header, chain, aligned,
                                      region_codes, len(qcodes),
                                      chrname=chrname,
                                      genome_offset=chrom_offset,
                                      summary_only=(fmt == "summary"),
                                      invertmode=args.invertmode,
                                      wraplength=args.wraplength,
                                      ngap=args.introngap,
                                      nolengths=args.nolengths,
                                      nomargin=args.nomargin))

    if args.gseg:
        region = next(read_fasta(args.gseg))
        rcodes, rnmask = dna.encode(region.sequence)
        config = GmapConfig()
        for rec in read_fasta(args.queries):
            qcodes, qnmask = dna.encode(rec.sequence)
            chain = align_cdna_both(qcodes, qnmask, rcodes, rnmask, config)
            if chain is None:
                continue
            emit(chain, rec, qcodes, region.accession, region.accession, 0,
                 region_codes=rcodes, tsize=len(rcodes))
    elif args.dir:
        db = GenomeDB.load(args.dir)
        index = DeviceIndex.from_host(db)
        source = args.db or db.name
        known = None
        if args.use_splicing:
            from tpumap.gsnap.knownsplicing import KnownSplicing
            from tpumap.io.iit import IIT
            known = KnownSplicing.from_splicing_iit(
                IIT.read(args.use_splicing), db)
        if args.chimera_margin == 0 and args.npaths == 1:
            # bulk path: batched device calls across queries
            recs = list(read_fasta(args.queries))
            BATCH = 256
            for bstart in range(0, len(recs), BATCH):
                group = recs[bstart:bstart + BATCH]
                encoded = [dna.encode(r.sequence) for r in group]
                results = align_queries_bulk(db, index, encoded,
                                             known=known)
                for rec, (qcodes, qnmask), hit in zip(group, encoded,
                                                      results):
                    if hit is None:
                        continue
                    chain, univ_off = hit
                    if not passes_filters(chain, len(qcodes),
                                          args.min_coverage,
                                          args.min_identity):
                        continue
                    _emit_db_hit(db, emit, fmt, rec, qcodes, chain,
                                 univ_off, source)
            return

        for rec in read_fasta(args.queries):
            qcodes, qnmask = dna.encode(rec.sequence)
            if args.chimera_margin > 0:
                from tpumap.gmap.chimera import align_query_chimera
                pieces = align_query_chimera(
                    db, index, qcodes, qnmask, GmapConfig(), Stage1Config(),
                    chimera_margin=args.chimera_margin)
            else:
                pieces = align_query_paths(db, index, qcodes, qnmask,
                                           npaths=args.npaths, known=known)
            for chain, univ_off in pieces:
                if not passes_filters(chain, len(qcodes),
                                      args.min_coverage,
                                      args.min_identity):
                    continue
                _emit_db_hit(db, emit, fmt, rec, qcodes, chain, univ_off,
                             source)
    else:
        ap.error("need -g or -D")


def passes_filters(chain, qlen, min_coverage, min_identity):
    """gmap --min-trimmed-coverage/--min-identity path filters."""
    if min_coverage > 0 and chain.coverage < min_coverage * qlen:
        return False
    aligned = chain.matches + chain.mismatches
    if min_identity > 0 and aligned and chain.matches < min_identity * aligned:
        return False
    return True


def _emit_db_hit(db, emit, fmt, rec, qcodes, chain, univ_off, source):
    import numpy as np
    chrom_idx = db.chrnum(univ_off + chain.exons[0].gstart)
    seqid = db.chrom_names[chrom_idx]
    chrom_offset = univ_off - int(db.chrom_offsets[chrom_idx])
    g_hi = chain.exons[-1].gend
    tsize = int(db.chrom_offsets[chrom_idx + 1]
                - db.chrom_offsets[chrom_idx])
    need_region = fmt in ("align", "summary", "samse", "sampe",
                          "protein_gen") or fmt.startswith("exons:")
    emit(chain, rec, qcodes, seqid, source, chrom_offset,
         region_codes=db.get_codes(univ_off, g_hi + 16).astype(np.uint8)
         if need_region else None,
         chrname=seqid, tsize=tsize)


if __name__ == "__main__":
    sys.exit(main())
