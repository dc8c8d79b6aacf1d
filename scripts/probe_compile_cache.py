"""Probe the persistent XLA compilation cache on the axon platform.

VERDICT r3 item 9: DGCNN's step program takes minutes of XLA compile
per process, taxing every bench round on the contended tunnel. jax's
persistent compilation cache (serialized executables keyed on HLO +
backend config) would cut that to a disk read on every run after the
first — IF the tunneled backend supports executable serialization.

Usage (two fresh processes; the second should be the cache hit):
    python scripts/probe_compile_cache.py dgcnn
    python scripts/probe_compile_cache.py dgcnn

Prints JSON: {"model":..., "compile_s":..., "cache_dir_entries":...}
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE_DIR = os.environ.get(
    "POINTCLOUDLIB_COMPILE_CACHE",
    os.path.expanduser("~/.cache/pointcloudlib_tpu/xla"))


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "dgcnn"
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from bench import WORKLOADS, workload_setup

    metric = next(n for n, _, _, _ in WORKLOADS if n.startswith(model))
    t0 = time.perf_counter()
    step, state, batch, key = workload_setup(metric)
    state, metrics = step(state, batch, key)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0
    n = len(os.listdir(CACHE_DIR)) if os.path.isdir(CACHE_DIR) else 0
    print(json.dumps({"model": model, "first_step_s": round(dt, 1),
                      "cache_dir_entries": n}))


if __name__ == "__main__":
    main()
