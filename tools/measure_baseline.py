#!/usr/bin/env python3
"""Measure the reference gsnap on the bench workloads -> BASELINE_MEASURED.json.

Measures BOTH hand-built reference configurations on the chr21-scale
workloads (tools/bench_data.py):

* gsnap        — nosimd single-thread (round-1 baseline, kept for
                 continuity);
* gsnap_avx2   — AVX2/popcnt build matching src/Makefile.am's
                 gsnap_avx2 flags; one core of the production SIMD
                 deployment.  bench.py multiplies its per-core number
                 by 32 for the 32-core-equivalent baseline.

Each config is timed on the DNA reads and the RNA reads (with -N 1).
Uses a subset of reads and extrapolates (single-thread reference is
slow; throughput is linear in read count).
"""
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools import bench_data

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")


def _subset(rfa: pathlib.Path, n_reads: int, tag: str) -> pathlib.Path:
    subset = bench_data.ROOT / f"reads_{tag}_{n_reads}.fa"
    if not subset.exists():
        with open(rfa) as f, open(subset, "w") as out:
            for i, line in enumerate(f):
                if i >= 2 * n_reads:
                    break
                out.write(line)
    return subset


def _time_gsnap(binary: pathlib.Path, dbdir: pathlib.Path, reads, n_reads,
                extra=()):
    t0 = time.perf_counter()
    r = subprocess.run([str(binary), "-D", str(dbdir), "-d", "bench",
                        "-t", "1", "-A", "sam", *extra, str(reads)],
                       capture_output=True, text=True, check=True)
    dt = time.perf_counter() - t0
    naligned = sum(1 for l in r.stdout.splitlines()
                   if l and not l.startswith("@")
                   and not int(l.split("\t")[1]) & 4)
    return n_reads / dt, naligned, dt


def main(n_reads: int = 20000):
    # 2000 reads gave 0.3-0.4 s walls dominated by index mmap/startup
    # (avx2 measured "slower" than nosimd); 20k reads -> multi-second
    # walls where per-read throughput dominates
    gfa, rfa = bench_data.ensure_files()
    _, rna_rfa = bench_data.ensure_rna_files()
    dbdir = bench_data.ROOT / "refdb"
    if not (dbdir / "bench" / "bench.genomecomp").exists():
        subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D",
                        str(dbdir), "-d", "bench", "-k", "15", "-q", "3",
                        "--local=0", str(gfa)], check=True,
                       capture_output=True)
    dna_sub = _subset(rfa, n_reads, "dna")
    rna_sub = _subset(rna_rfa, n_reads, "rna")

    out = {}
    for name, binary in (("gsnap", REFBIN / "gsnap"),
                         ("gsnap_avx2", REFBIN / "gsnap_avx2")):
        if not binary.exists():
            print(f"# {binary} missing — run tools/build_reference.py "
                  f"--targets {name}", file=sys.stderr)
            continue
        key = "" if name == "gsnap" else "_avx2"
        # warm the page cache with a tiny run
        _time_gsnap(binary, dbdir, _subset(rfa, 50, "dna"), 50)
        rps, naligned, dt = _time_gsnap(binary, dbdir, dna_sub, n_reads)
        out[f"gsnap{key}_reads_per_sec"] = round(rps, 1)
        out[f"gsnap{key}_dna_aligned"] = naligned
        out[f"gsnap{key}_dna_wall_s"] = round(dt, 2)
        # marginal (steady-state) throughput: slope between the n_reads
        # subset and the full read set removes process startup + index
        # page-in from the denominator — the honest per-core number for
        # a production run that amortizes startup over millions of reads.
        # median of 3 repeats: the slope window is ~1 s on this host and
        # single runs jitter 1.5x
        slopes = []
        for _ in range(3):
            _, _, dt_sub = _time_gsnap(binary, dbdir, dna_sub, n_reads)
            _, _, dt_all = _time_gsnap(binary, dbdir, rfa,
                                       bench_data.N_READS)
            if dt_all > dt_sub:
                slopes.append((bench_data.N_READS - n_reads)
                              / (dt_all - dt_sub))
        if slopes:
            out[f"gsnap{key}_dna_marginal_rps"] = round(
                sorted(slopes)[len(slopes) // 2], 1)
        rps, naligned, dt = _time_gsnap(binary, dbdir, rna_sub, n_reads,
                                        extra=("-N", "1"))
        out[f"gsnap{key}_rna_reads_per_sec"] = round(rps, 1)
        out[f"gsnap{key}_rna_aligned"] = naligned
        out[f"gsnap{key}_rna_wall_s"] = round(dt, 2)
        slopes = []
        for _ in range(3):
            _, _, dt_sub = _time_gsnap(binary, dbdir, rna_sub, n_reads,
                                       extra=("-N", "1"))
            _, _, dt_all = _time_gsnap(binary, dbdir, rna_rfa,
                                       bench_data.N_READS,
                                       extra=("-N", "1"))
            if dt_all > dt_sub:
                slopes.append((bench_data.N_READS - n_reads)
                              / (dt_all - dt_sub))
        if slopes:
            out[f"gsnap{key}_rna_marginal_rps"] = round(
                sorted(slopes)[len(slopes) // 2], 1)

    # paired-end (BASELINE.md plan row 4): avx2 build, FR pairs
    pe1, pe2 = bench_data.ensure_pe_files()
    binary = REFBIN / "gsnap_avx2"
    if binary.exists():
        def _pe_sub(n):
            s1 = _subset(pe1, n, "pe1")
            s2 = _subset(pe2, n, "pe2")
            return s1, s2

        def _time_pe(f1, f2, npairs):
            t0 = time.perf_counter()
            r = subprocess.run(
                [str(binary), "-D", str(dbdir), "-d", "bench", "-t", "1",
                 "-A", "sam", "--pairmax-dna", "1000", str(f1), str(f2)],
                capture_output=True, text=True, check=True)
            dt = time.perf_counter() - t0
            conc = sum(1 for l in r.stdout.splitlines()
                       if l and not l.startswith("@")
                       and int(l.split("\t")[1]) & 2)
            return dt, conc

        nsub = 5000
        s1, s2 = _pe_sub(nsub)
        _time_pe(s1, s2, nsub)                  # warm page cache
        dt_sub, _ = _time_pe(s1, s2, nsub)
        out["gsnap_avx2_pe_reads_per_sec"] = round(2 * nsub / dt_sub, 1)
        slopes = []
        for _ in range(3):
            _, _c = _time_pe(s1, s2, nsub)
            dt_sub2, _ = _time_pe(s1, s2, nsub)
            dt_all, conc = _time_pe(pe1, pe2, bench_data.PE_N_PAIRS)
            if dt_all > dt_sub2:
                slopes.append(2 * (bench_data.PE_N_PAIRS - nsub)
                              / (dt_all - dt_sub2))
        if slopes:
            out["gsnap_avx2_pe_marginal_rps"] = round(
                sorted(slopes)[len(slopes) // 2], 1)
            out["gsnap_avx2_pe_concordant"] = conc

    # GMAP cDNA throughput (the bench_gmap workload, avx2-equivalent is
    # not built for gmap — the reference gmap build here is nosimd)
    gmap = REFBIN / "gmap"
    if gmap.exists():
        from tools.bench_gmap import make_queries
        from tpumap.index import GenomeDB
        db = GenomeDB.load(str(bench_data.ROOT / "db_k14")) \
            if (bench_data.ROOT / "db_k14" / "meta.json").exists() else None
        if db is not None:
            qfa = bench_data.ROOT / "gmap_queries.fa"
            if not qfa.exists():
                qs = make_queries(db)
                with open(qfa, "w") as f:
                    for i, q in enumerate(qs):
                        f.write(f">q{i}\n{q}\n")
            t0 = time.perf_counter()
            subprocess.run([str(gmap), "-D", str(dbdir), "-d", "bench",
                            "-t", "1", "-f", "samse", str(qfa)],
                           capture_output=True, text=True, check=True)
            dt = time.perf_counter() - t0
            nq = sum(1 for l in open(qfa) if l.startswith(">"))
            out["gmap_queries_per_sec"] = round(nq / dt, 1)

    out["config"] = (f"-t 1 (1-core host), k=15/q3 index, {n_reads} of "
                     f"{bench_data.N_READS} bench reads, chr21-scale "
                     f"genome ({bench_data.GENOME_LEN} bp)")
    path = pathlib.Path(__file__).parent.parent / "BASELINE_MEASURED.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing.update(out)
    path.write_text(json.dumps(existing, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
