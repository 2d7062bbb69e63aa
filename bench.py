#!/usr/bin/env python3
"""Benchmark: GSNAP-style short-read alignment throughput on one chip.

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s/chip",
   "vs_baseline": R}

Baseline: the reference gsnap (hand-built nosimd, single thread — the only
configuration that runs on this 1-core host; see BASELINE.md) measured on
the identical workload by tools/measure_baseline.py, recorded below.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

# reads/sec of /tmp/refbin/gsnap -t 1 (nosimd) on this workload; measured by
# tools/measure_baseline.py (see BASELINE.md "measured" table).
BASELINE_READS_PER_SEC = None
_baseline_file = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
if _baseline_file.exists():
    BASELINE_READS_PER_SEC = json.loads(_baseline_file.read_text()).get(
        "gsnap_reads_per_sec")


def main():
    import jax
    import jax.numpy as jnp

    from tools import bench_data
    from tpumap.gsnap.engine import (AlignConfig,
                                     align_batch_cascaded_packed)
    from tpumap.ops import pack
    from tpumap.index import GenomeDB, build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import read_fasta
    from tpumap.utils import dna

    gfa, rfa = bench_data.ensure_files()
    dbdir = bench_data.ROOT / "db_k13"
    if (dbdir / "meta.json").exists():
        db = GenomeDB.load(str(dbdir))
    else:
        db = build_db(gfa, name="bench", k=13, interval=3)
        db.save(str(dbdir))
    index = DeviceIndex.from_host(db)
    config = AlignConfig(top_k=4, max_occ=4)

    # load reads into one big [N, L] batch set; reads are PACKED on the
    # host (4x smaller transfer — the tunnel-attached chip makes
    # host->device bytes a first-order cost) and unpacked on device
    reads = list(read_fasta(rfa))
    N, L = len(reads), 112
    codes = np.zeros((N, L), dtype=np.uint8)
    nmask = np.zeros((N, L), dtype=np.uint8)
    lengths = np.full(N, bench_data.READ_LEN, dtype=np.int32)
    for i, r in enumerate(reads):
        c, m = dna.encode(r.sequence)
        codes[i, :len(c)] = c
        nmask[i, :len(c)] = m
    packed = pack.pack_reads_host(codes)
    pnmask = pack.pack_reads_host(nmask)

    B = 16384
    nbatch = N // B

    def run_batch(i):
        sl = slice(i * B, (i + 1) * B)
        pbatch = {"packed": jnp.asarray(packed[sl]),
                  "pnmask": jnp.asarray(pnmask[sl]),
                  "lengths": jnp.asarray(lengths[sl])}
        return align_batch_cascaded_packed(index, pbatch, config, L, 3,
                                           256)

    # warmup/compile
    out = run_batch(0)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = []
    for i in range(nbatch):
        outs.append(run_batch(i))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    n_aligned = int(sum(np.asarray(o["mapped"]).sum() for o in outs))
    reads_per_sec = nbatch * B / dt
    vs = (reads_per_sec / BASELINE_READS_PER_SEC
          if BASELINE_READS_PER_SEC else None)
    print(json.dumps({
        "metric": "reads_per_sec",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "aligned_frac": round(n_aligned / (nbatch * B), 4),
        "wall_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
