"""Persistent XLA compilation cache setup.

Compilation through the tunnel-attached TPU backend is the single
largest fixed cost of a run (a trivial jit measures ~30 s; the full
cascade + refinement-ladder kernel set is minutes).  The reference
amortizes nothing — it is ahead-of-time C — so matching its startup
behavior requires persisting compiled executables across processes.

Enabled automatically on tpumap import (CLI drivers, bench, tests);
opt out with TPUMAP_NO_JAX_CACHE=1, relocate with TPUMAP_JAX_CACHE=dir.
"""
from __future__ import annotations

import os

_done = False


def enable() -> None:
    global _done
    if _done or os.environ.get("TPUMAP_NO_JAX_CACHE"):
        return
    _done = True
    cache_dir = os.environ.get(
        "TPUMAP_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpumap", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: even "fast" compiles cost ~1 s on this backend
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
