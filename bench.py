#!/usr/bin/env python3
"""Benchmark: GSNAP/GMAP throughput on one chip, measured END-TO-END.

Workloads on a chr21-scale genome (46.7 Mbp, tools/bench_data.py):

* DNA (headline): 100 bp reads, 1% substitutions — align_records through
  final SAM text (ladder + native emission), >= 1 s of wall; the device
  cascade is also timed alone as a secondary number.
* RNA: 40% spliced reads (1-2 GT..AG junctions) — end-to-end, with
  junction-level precision/recall/F1 against the generator's truth.
* PE: 20k FR pairs — end-to-end through the paired driver, with the
  concordance rate.
* GMAP: 256 multi-exon cDNAs through the bulk cDNA aligner.

Prints ONE JSON line. vs_baseline ratios compare against a
32-core-EQUIVALENT of the reference: per-core AVX2 gsnap marginal
throughput (tools/measure_baseline.py, hand-built, steady-state slope)
x 32 assuming perfect core scaling — the deployment baseline BASELINE.md
demands. Timing on this backend is only trustworthy when values are
actually materialized; every timed region here ends in host bytes.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

BASELINE_CORES = 32


def _load_baseline():
    f = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    if not f.exists():
        return {}, "unmeasured"
    d = json.loads(f.read_text())
    out = {}
    for k, keys in (
            ("dna", ("gsnap_avx2_dna_marginal_rps",
                     "gsnap_avx2_reads_per_sec", "gsnap_dna_marginal_rps",
                     "gsnap_reads_per_sec")),
            ("rna", ("gsnap_avx2_rna_marginal_rps",
                     "gsnap_avx2_rna_reads_per_sec",
                     "gsnap_rna_marginal_rps", "gsnap_rna_reads_per_sec")),
            ("pe", ("gsnap_avx2_pe_marginal_rps",
                    "gsnap_avx2_pe_reads_per_sec",
                    "gsnap_pe_reads_per_sec")),
            ("gmap", ("gmap_queries_per_sec",))):
        v = next((d[key] for key in keys if d.get(key)), None)
        if v:
            out[k] = v * (BASELINE_CORES if k != "gmap" else 1)
    note = ("avx2 marginal 1-core x 32"
            if d.get("gsnap_avx2_dna_marginal_rps") else "nosimd x 32")
    return out, note


def _vs(value, base):
    return round(value / base, 2) if base else None


def _junctions(rec):
    """Genomic (donor, acceptor) junction pairs from a SAM record
    (single-chromosome bench genome: univcoord == chrpos)."""
    if rec.flag & 4:
        return ()
    cig = rec.cigar
    if "N" not in cig:
        return ()
    js = []
    cur = rec.pos - 1
    num = 0
    for ch in cig:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            if ch == "N":
                js.append((cur, cur + num))
                cur += num
            elif ch in "MD=X":
                cur += num
            num = 0
    return js


def _parse_line(line: str):
    """(flag, pos, cigar, xa) from one SAM text line (bench genome is
    single-chromosome, so univcoord == chrpos)."""
    c = line.split("\t")
    xa = next((t[5:] for t in c[11:] if t.startswith("XA:Z:")), None)
    return int(c[1]), int(c[3]), c[5], xa


def _cigar_junctions(pos: int, cigar: str):
    """Genomic (donor, acceptor) pairs from pos + CIGAR."""
    if "N" not in cigar:
        return ()
    js = []
    cur = pos - 1
    num = 0
    for ch in cigar:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            if ch == "N":
                js.append((cur, cur + num))
                cur += num
            elif ch in "MD=X":
                cur += num
            num = 0
    return js


def _ref_span(cigar: str) -> int:
    """Reference bases consumed by a CIGAR."""
    n = num = 0
    for ch in cigar:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            if ch in "MDN=X":
                n += num
            num = 0
    return n


def _xa_junctions(pos: int, cigar: str, xa: str):
    """Candidate (donor, acceptor) pairs implied by the XA:Z: ambiguous
    splice-end alternates (tied distal placements of a demoted terminal
    exon, src/altsplice.c): qstart dists anchor at the record start
    (acceptor side), qend dists at the record end (donor side)."""
    if not xa:
        return ()
    qs, _, qe = xa.partition("|")
    js = []
    start = pos - 1
    for d in qs.split(","):
        if d:
            js.append((start - int(d), start))
    end = pos - 1 + _ref_span(cigar)
    for d in qe.split(","):
        if d:
            js.append((end, end + int(d)))
    return js


def _sam_bytes(records):
    """Materialize final SAM text (the end-to-end contract)."""
    return sum(len(r.lines()) for r in records)


def main():
    import jax
    import jax.numpy as jnp

    from tools import bench_data
    from tpumap.gsnap.driver import align_records
    from tpumap.gsnap.engine import (AlignConfig,
                                     align_batch_cascaded_packed)
    from tpumap.gsnap.paired import align_paired_records
    from tpumap.ops import pack
    from tpumap.index import GenomeDB, build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record, read_fasta
    from tpumap.utils import dna

    base, base_note = _load_baseline()
    gfa, rfa = bench_data.ensure_files()
    dbdir = bench_data.ROOT / "db_k14"
    if (dbdir / "meta.json").exists():
        db = GenomeDB.load(str(dbdir))
    else:
        db = build_db(gfa, name="bench", k=14, interval=3)
        db.save(str(dbdir))
    index = DeviceIndex.from_host(db)
    config = AlignConfig(top_k=4, max_occ=4)
    B = 32768
    out = {"baseline": base_note}

    # ---- DNA end-to-end (headline) -----------------------------------
    # The timed region is steady state: the warm call compiles/loads every
    # program the run will use (the driver pads tail batches to the same
    # (B, L) shape, so ONE shape covers the whole run), and its wall time
    # is reported separately as warmup_s — cold start is a real cost but a
    # different number from throughput (VERDICT r3 weak #3).
    # Timed path = the production streaming path (align_records sink=...):
    # final SAM text bytes land in a buffer; accuracy is graded from the
    # same bytes afterwards, untimed.
    import io
    reads = list(read_fasta(rfa))
    t0 = time.perf_counter()
    align_records(db, index, reads[:B], config, batch_size=B,
                  sink=io.BytesIO().write)                        # warm
    out["warmup_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    buf = io.BytesIO()
    stats = {}
    align_records(db, index, reads, config, batch_size=B,
                  sink=buf.write, stats=stats)
    dna_dt = time.perf_counter() - t0
    dna_rps = len(reads) / dna_dt
    out.update({
        "metric": "reads_per_sec",
        "value": round(dna_rps, 1),
        "unit": "reads/s/chip",
        "vs_baseline": _vs(dna_rps, base.get("dna")),
        "wall_s": round(dna_dt, 3),
        "sam_mb": round(buf.tell() / 1e6, 1),
        "aligned_frac": round(1 - stats.get("unmapped", 0) / len(reads),
                              4),
    })
    del buf

    # ---- DNA device cascade alone (secondary) ------------------------
    N, L = len(reads), 112
    codes = np.zeros((N, L), dtype=np.uint8)
    lengths = np.full(N, bench_data.READ_LEN, dtype=np.int32)
    for i, r in enumerate(reads):
        c, _ = dna.encode(r.sequence)
        codes[i, :len(c)] = c
    packed = pack.pack_reads_host(codes)
    stub = jnp.zeros((1, 1), dtype=jnp.uint32)
    lend = jnp.asarray(lengths[:B])

    def cascade(i):
        sl = slice(i * B, (i + 1) * B)
        pb = {"packed": jnp.asarray(packed[sl]), "pnmask": stub,
              "lengths": lend}
        return align_batch_cascaded_packed(index, pb, config, L)

    r = cascade(0)
    _ = np.asarray(r["nmismatch"])          # force real execution
    t0 = time.perf_counter()
    total = 0
    nb = N // B
    mapped = 0
    while time.perf_counter() - t0 < 1.0:   # >= 1 s of wall (VERDICT r2)
        for i in range(nb):
            r = cascade(i)
            mapped += int(np.asarray(r["mapped"]).sum())
        total += nb * B
    casc_dt = time.perf_counter() - t0
    out["dna_cascade_reads_per_sec"] = round(total / casc_dt, 1)
    out["dna_cascade_vs_baseline"] = _vs(total / casc_dt, base.get("dna"))

    # ---- RNA end-to-end + junction truth accuracy --------------------
    # RNA is device-bound (chain/salvage stages), so a 16k batch loses
    # almost nothing to RPC amortization while keeping the compaction
    # shapes half the size of the 32k DNA batch
    RB = 16384
    _, rna_rfa = bench_data.ensure_rna_files()
    rna_reads = list(read_fasta(rna_rfa))
    t0 = time.perf_counter()
    align_records(db, index, rna_reads[:RB], config, novelsplicing=True,
                  batch_size=RB, sink=io.BytesIO().write)        # warm
    out["rna_warmup_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    rbuf = io.BytesIO()
    align_records(db, index, rna_reads, config, novelsplicing=True,
                  batch_size=RB, sink=rbuf.write)
    rna_dt = time.perf_counter() - t0
    truth = bench_data.rna_truth()
    tp = fp = fn = 0
    xa_cred = 0
    n_loc = 0
    rna_spliced = 0
    rna_mapped = 0
    lines = rbuf.getvalue().decode().splitlines()
    assert len(lines) == len(truth)
    for line, (tjs, tstart) in zip(lines, truth):
        flag, pos, cigar, xa = _parse_line(line)
        pjs = set(_cigar_junctions(pos, cigar))
        if pjs:
            rna_spliced += 1
        if not flag & 4:
            rna_mapped += 1
        tp += len(pjs & tjs)
        fp += len(pjs - tjs)
        missed = tjs - pjs
        fn += len(missed)
        if missed and xa:
            # XA-credited: a truth junction among the tied alternates of
            # a demoted ambiguous end counts as recalled (the demotion is
            # altsplice.c behavior, not a miss)
            xa_cred += len(missed & set(_xa_junctions(pos, cigar, xa)))
        if not flag & 4 and abs(pos - 1 - tstart) <= 150:
            n_loc += 1
    prec = tp / max(tp + fp, 1)
    rec_ = tp / max(tp + fn, 1)
    rna_rps = len(rna_reads) / rna_dt
    out.update({
        "rna_reads_per_sec": round(rna_rps, 1),
        "rna_vs_baseline": _vs(rna_rps, base.get("rna")),
        "rna_mapped_frac": round(rna_mapped / len(rna_reads), 4),
        "rna_spliced_frac": round(rna_spliced / len(rna_reads), 4),
        "rna_junction_precision": round(prec, 4),
        "rna_junction_recall": round(rec_, 4),
        "rna_junction_recall_xa": round((tp + xa_cred) / max(tp + fn, 1),
                                        4),
        "rna_junction_f1": round(2 * prec * rec_ / max(prec + rec_, 1e-9),
                                 4),
        "rna_locus_acc": round(n_loc / len(rna_reads), 4),
    })
    del rbuf, lines

    # ---- paired-end --------------------------------------------------
    f1, f2 = bench_data.ensure_pe_files()
    r1 = list(read_fasta(f1))
    r2 = list(read_fasta(f2))
    pairs = list(zip(r1, r2))
    PB = 8192
    t0 = time.perf_counter()
    align_paired_records(db, index, pairs[:PB], config, batch_size=PB,
                         pairmax=1000, sink=io.BytesIO().write)  # warm
    out["pe_warmup_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pbuf = io.BytesIO()
    align_paired_records(db, index, pairs, config, batch_size=PB,
                         pairmax=1000, sink=pbuf.write)
    pe_dt = time.perf_counter() - t0
    pe_rps = 2 * len(pairs) / pe_dt
    first = [l for l in pbuf.getvalue().decode().splitlines()
             if int(l.split("\t", 2)[1]) & 0x40]
    conc = sum(1 for l in first
               if int(l.split("\t", 2)[1]) & 2) / max(len(first), 1)
    out.update({
        "pe_reads_per_sec": round(pe_rps, 1),
        "pe_vs_baseline": _vs(pe_rps, base.get("pe")),
        "pe_concordant_frac": round(conc, 4),
    })
    del pbuf

    # ---- GMAP cDNA ----------------------------------------------------
    try:
        from tools.bench_gmap import make_queries
        from tpumap.cli.gmap_cli import align_queries_bulk
        queries = make_queries(db)
        enc = [dna.encode(q) for q in queries]
        align_queries_bulk(db, index, enc)                       # warm
        t0 = time.perf_counter()
        res = align_queries_bulk(db, index, enc)
        gmap_dt = time.perf_counter() - t0
        out["gmap_queries_per_sec"] = round(len(queries) / gmap_dt, 1)
        out["gmap_vs_baseline"] = _vs(len(queries) / gmap_dt,
                                      base.get("gmap"))
        # reference gmap is multithreaded (src/gmap.c:4867 worker pool);
        # grade against the same 32-core equivalent as the gsnap rows
        out["gmap_vs_baseline32"] = _vs(
            len(queries) / gmap_dt,
            base["gmap"] * BASELINE_CORES if base.get("gmap") else None)
        out["gmap_found_frac"] = round(sum(1 for x in res if x)
                                       / len(queries), 4)
    except Exception as exc:                # keep the bench JSON intact
        out["gmap_error"] = f"{type(exc).__name__}: {exc}"

    # ---- DP cells/sec/chip (BASELINE.json second headline) -----------
    from tpumap.ops import dp as dp_ops
    DB, DLQ, DBAND = 8192, 112, 16
    rng = np.random.default_rng(7)
    qc = jnp.asarray(rng.integers(0, 4, (DB, DLQ)).astype(np.uint8))
    gc = jnp.asarray(rng.integers(0, 4, (DB, DLQ + 2 * DBAND))
                     .astype(np.uint8))
    ql = jnp.full(DB, DLQ, jnp.int32)
    gl = jnp.full(DB, DLQ + 2 * DBAND, jnp.int32)
    r = dp_ops.banded_align(qc, ql, gc, gl, DBAND)
    _ = np.asarray(r["score"][:4])
    NREP = 10
    t0 = time.perf_counter()
    for _i in range(NREP):
        r = dp_ops.banded_align(qc, ql, gc, gl, DBAND)
    _ = np.asarray(r["score"][:4])
    dp_dt = time.perf_counter() - t0
    out["dp_cells_per_sec"] = round(
        NREP * DB * DLQ * (2 * DBAND + 1) / dp_dt, 0)

    # ---- HBM-scale residency (tools/bench_large.py, run separately:
    # the 500 Mbp build + k=15 compile are one-time costs cached on
    # disk; its measured numbers fold into this line when present) ----
    large = pathlib.Path(__file__).parent / "LARGE_GENOME.json"
    if large.exists():
        d = json.loads(large.read_text())
        out.update({
            "large_genome_bp": d.get("genome_bp"),
            "large_index_hbm_gb": d.get("index_hbm_gb"),
            "large_reads_per_sec": d.get("large_reads_per_sec"),
            "large_vs_baseline": _vs(d.get("large_reads_per_sec", 0),
                                     base.get("dna")),
            "large_aligned_frac": d.get("aligned_frac"),
            "large_hbm_upload_s": d.get("hbm_upload_s"),
        })
        if d.get("partial"):
            out["large_partial"] = True

    print(json.dumps(out))


if __name__ == "__main__":
    main()
