#!/usr/bin/env python3
"""Device-side profile of the fused DNA ladder: top XLA fusions by time.

Traces one steady-state batch with jax.profiler and summarizes per-op
device time from the trace protobuf.
"""
import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tools import bench_data
    from tpumap.gsnap import ladder
    from tpumap.gsnap.driver import _pack_batch, make_batch
    from tpumap.gsnap.engine import AlignConfig
    from tpumap.index import GenomeDB, build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import read_fasta
    from tpumap.ops import pathdp
    from tpumap.utils.fetch import device_fetch

    gfa, rfa = bench_data.ensure_files()
    dbdir = bench_data.ROOT / "db_k14"
    db = (GenomeDB.load(str(dbdir)) if (dbdir / "meta.json").exists()
          else build_db(gfa, name="bench", k=14, interval=3))
    index = DeviceIndex.from_host(db)
    config = AlignConfig(top_k=4, max_occ=4)
    B, L = 16384, 112
    reads = list(read_fasta(rfa))
    sc = pathdp.PathScoring(max_intron=200_000)
    splicing = len(sys.argv) > 1 and sys.argv[1] == "rna"

    batch = make_batch(reads[:B], B, L)
    pb = _pack_batch(batch)

    def run():
        dev = ladder.align_batch_full(index, pb, config, L, sc,
                                      splicing, splicing,
                                      8192, 2048, 2048)
        return device_fetch(dev)

    run()                      # warm/compile
    t0 = time.perf_counter()
    run()
    print(f"steady batch wall: {(time.perf_counter()-t0)*1000:.1f} ms",
          file=sys.stderr)

    tdir = "/tmp/tpumap_trace"
    import shutil
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    run()
    jax.profiler.stop_trace()

    # parse trace.json.gz for device-lane events
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device PIDs (process names containing TPU/device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0        # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"device total: {total:.1f} ms  (pids: "
          f"{[pid_names[p] for p in dev_pids]})")
    for name, ms in top:
        print(f"{ms:9.2f} ms  {name[:130]}")


if __name__ == "__main__":
    main()
