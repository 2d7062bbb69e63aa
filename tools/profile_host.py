#!/usr/bin/env python3
"""Per-stage host-leg profile of the DNA end-to-end path (round-5 task 1).

Replicates align_records' fused fast path with explicit timers so each
host stage's cost is measured separately from device time.  Run on the
real chip; prints a JSON breakdown per 16,384-read batch.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax.numpy as jnp

    from tools import bench_data
    from tpumap.gsnap import ladder
    from tpumap.gsnap.driver import (_bulk_emit_chunk, _pack_batch,
                                     make_batch, refine_unsolved)
    from tpumap.gsnap.engine import AlignConfig, mapq_from_scores
    from tpumap.index import GenomeDB, build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import read_fasta
    from tpumap.io.sam_bulk import RawSamRecord
    from tpumap.ops import pathdp
    from tpumap.utils.fetch import device_fetch

    gfa, rfa = bench_data.ensure_files()
    dbdir = bench_data.ROOT / "db_k14"
    db = (GenomeDB.load(str(dbdir)) if (dbdir / "meta.json").exists()
          else build_db(gfa, name="bench", k=14, interval=3))
    index = DeviceIndex.from_host(db)
    config = AlignConfig(top_k=4, max_occ=4)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    L = 112
    reads = list(read_fasta(rfa))
    sc = pathdp.PathScoring(max_intron=200_000)

    t = {}

    def tick(name, t0):
        t[name] = t.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    def run_batch(start, timed):
        chunk = reads[start:start + B]
        t0 = time.perf_counter()
        batch = make_batch(chunk, B, L)
        if timed:
            t0 = tick("make_batch", t0)
        pb = _pack_batch(batch)
        if timed:
            t0 = tick("pack+h2d", t0)
        dev = ladder.align_batch_full(index, pb, config, L, sc,
                                      False, False,
                                      min(8192, B), min(2048, B),
                                      min(2048, B))
        if timed:
            t0 = tick("dispatch", t0)
        res = device_fetch(dev)
        if timed:
            t0 = tick("fetch(dev+rpc)", t0)
        mapq = mapq_from_scores(res["nmismatch"], res["second_nmismatch"],
                                res["n_best"], batch["lengths"])
        if timed:
            t0 = tick("mapq", t0)
        amb = {}
        dp_r, sp_r, fu_r = refine_unsolved(
            db, index, batch, res, config, novelsplicing=False,
            max_intron=200_000, L=L, amb_out=amb)
        if timed:
            t0 = tick("refine", t0)
        bulk = _bulk_emit_chunk(db, chunk, batch, res, mapq,
                                ({}, sp_r, fu_r, dp_r, amb), config, None)
        if timed:
            t0 = tick("bulk_emit", t0)
        lines, flags, methods = bulk
        out = []
        unm = methods == "unmapped"
        mq_l = np.where(unm, 0, mapq[:len(lines)]).tolist()
        out.extend(map(RawSamRecord, lines, flags.tolist(), mq_l))
        if timed:
            t0 = tick("records", t0)
        nb = sum(len(r.lines()) for r in out)
        if timed:
            tick("sam_bytes", t0)
        return nb

    # warm
    run_batch(0, False)
    t.clear()
    NB = 3
    tw0 = time.perf_counter()
    for i in range(NB):
        run_batch(i * B, True)
    wall = time.perf_counter() - tw0
    out = {k: round(v / NB * 1000, 1) for k, v in t.items()}
    out["batch"] = B
    out["wall_ms_per_batch"] = round(wall / NB * 1000, 1)
    out["reads_per_sec"] = round(NB * B / wall, 0)
    host = sum(v for k, v in t.items()
               if k not in ("fetch(dev+rpc)",)) / NB * 1000
    out["host_ms_per_batch"] = round(host, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
