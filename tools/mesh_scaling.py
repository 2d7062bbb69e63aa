#!/usr/bin/env python3
"""Virtual-mesh scaling measurement of the FUSED ladder (VERDICT r5 #7).

Real multi-chip hardware is unavailable here, so the curve is measured
on N virtual CPU devices sharing ONE host core.  With total work fixed,
ideal GSPMD partitioning keeps wall time FLAT as the mesh grows (each
virtual device does 1/N of the work on the same core); the measured
ratio wall(N)/wall(1) is therefore the partitioning + collective
overhead of the sharded program — `efficiency` below = wall(1)/wall(N).
This validates that the one-jit ladder partitions cleanly along `data`
(no replicated recompute, no degenerate all-gathers); absolute speedup
needs real chips.

Run:  python tools/mesh_scaling.py            # all mesh sizes
      python tools/mesh_scaling.py <N>        # one size (subprocess)
"""
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B = 8192
L = 112


def run_one(nd: int):
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={nd}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", nd)
    import numpy as np

    from tools import bench_data
    from tpumap.gsnap.driver import align_records
    from tpumap.gsnap.engine import AlignConfig
    from tpumap.index import GenomeDB
    from tpumap.io.fasta import read_fasta
    from tpumap.ops import pathdp
    from tpumap.parallel.mesh import (batch_sharding, make_mesh)
    from tpumap.parallel.pipeline import MeshContext
    from tpumap.parallel.sharded import make_sharded_full_aligner
    from tpumap.utils import dna

    db = GenomeDB.load(str(bench_data.ROOT / "db_k14"))
    mesh = make_mesh(nd, index_shards=1)
    config = AlignConfig(top_k=4, max_occ=4)
    reads = list(read_fasta(bench_data.ensure_files()[1]))[:B]
    row = {"n_devices": nd, "batch": B}

    # (a) shard_map full ladder — the production scale-out path: each
    # device runs the LOCAL program on its batch shard (explicit
    # collectives only where the design needs them)
    arrays, align = make_sharded_full_aligner(
        mesh, db, config, scoring=pathdp.PathScoring(max_intron=200_000),
        splicing=False, paired=False)
    codes = np.zeros((B, L), np.uint8)
    nm = np.zeros((B, L), bool)
    ln = np.full(B, 100, np.int32)
    for i, r in enumerate(reads):
        c, _m = dna.encode(r.sequence)
        codes[i, :len(c)] = c
    batch = {"codes": codes, "nmask": nm, "lengths": ln}
    bsh = batch_sharding(mesh)
    dev = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    out = align(arrays, dev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    REP = 2
    for _ in range(REP):
        out = align(arrays, dev)
        jax.block_until_ready(out)
    row["shardmap_wall_s"] = round((time.perf_counter() - t0) / REP, 3)

    # (b) GSPMD MeshContext (single-program convenience path) through
    # the full streaming driver
    import io
    ctx = MeshContext(mesh, db)
    align_records(db, ctx.index, reads, config, batch_size=B,
                  device_ctx=ctx, sink=io.BytesIO().write)      # warm
    t0 = time.perf_counter()
    for _ in range(REP):
        align_records(db, ctx.index, reads, config, batch_size=B,
                      device_ctx=ctx, sink=io.BytesIO().write)
    row["gspmd_wall_s"] = round((time.perf_counter() - t0) / REP, 3)
    print(json.dumps(row))


def main():
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]))
        return
    rows = []
    for nd in (1, 2, 4, 8):
        r = subprocess.run([sys.executable, __file__, str(nd)],
                           capture_output=True, text=True, timeout=3000)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={nd} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(rows[-1])
    if rows and rows[0]["n_devices"] == 1:
        for key in ("shardmap_wall_s", "gspmd_wall_s"):
            base = rows[0][key]
            for r in rows:
                r[f"{key[:-7]}_efficiency"] = round(base / r[key], 3)
    out = {"note": ("virtual CPU mesh, 1 physical core: total work is "
                    "fixed, so ideal partitioning keeps wall FLAT; "
                    "efficiency = wall(1)/wall(N) measures the sharded "
                    "program's partitioning+collective overhead. "
                    "shardmap = production scale-out path "
                    "(parallel/sharded.py, explicit per-device "
                    "programs); gspmd = MeshContext auto-partitioned "
                    "single program, whose CPU-emulated collectives "
                    "overstate multi-chip overhead"),
           "genome_bp": 46_700_000, "k": 14, "batch": B, "rows": rows}
    pathlib.Path("MESH_SCALING.json").write_text(json.dumps(out,
                                                            indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
