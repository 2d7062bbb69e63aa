#!/usr/bin/env python3
"""Measure the reference gsnap on the bench workload -> BASELINE_MEASURED.json.

Requires the hand-built oracle binaries (tools/build_reference.py) in
/tmp/refbin. Uses a subset of reads and extrapolates (the nosimd
single-thread reference is slow; throughput is linear in read count).
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


def main(n_reads: int = 2000):
    gfa, rfa = bench_data.ensure_files()
    dbdir = bench_data.ROOT / "refdb"
    if not (dbdir / "bench" / "bench.genomecomp").exists():
        subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(dbdir),
                        "-d", "bench", "-k", "15", "-q", "3", "--local=0",
                        str(gfa)], check=True, capture_output=True)
    subset = bench_data.ROOT / f"reads_{n_reads}.fa"
    if not subset.exists():
        with open(rfa) as f, open(subset, "w") as out:
            for i, line in enumerate(f):
                if i >= 2 * n_reads:
                    break
                out.write(line)
    # warm cache
    t0 = time.perf_counter()
    r = subprocess.run([str(REFBIN / "gsnap"), "-D", str(dbdir), "-d", "bench",
                        "-t", "1", "-A", "sam", str(subset)],
                       capture_output=True, text=True, check=True)
    dt = time.perf_counter() - t0
    naligned = sum(1 for l in r.stdout.splitlines()
                   if l and not l.startswith("@") and not int(l.split("\t")[1]) & 4)
    rps = n_reads / dt
    out = {
        "gsnap_reads_per_sec": round(rps, 1),
        "config": "nosimd, -t 1 (1-core host), k=15/q3 index, "
                  f"{n_reads} of {bench_data.N_READS} bench reads",
        "aligned": naligned,
        "wall_s": round(dt, 2),
    }
    path = pathlib.Path(__file__).parent.parent / "BASELINE_MEASURED.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing.update(out)
    path.write_text(json.dumps(existing, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
