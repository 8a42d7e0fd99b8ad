#!/usr/bin/env python
"""Benchmark: batched Time-RG cosmologies per minute.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.json): >= 100 cosmologies/min for the full
Time-RG+TNS pipeline at nk=128 (1-loop mode, 7 output redshifts, the
reference example configuration).

Execution split: per-cosmology setup (growth tables etc.) runs on the host
CPU backend — it is file-adjacent setup work, and the growth while_loop
additionally triggers a TPU-runtime fault on the current axon stack — while
the solver (eta evolution + FAST-PT outputs) runs batched on the
accelerator with the DFT-matmul engine.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: TPU remote-AOT compiles of the full pipeline
# are minutes-scale; cache them across bench invocations
_cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import driver, model as mdl  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
BASELINE = 100.0  # cosmologies/min target


def _accelerator_responsive(timeout_s: float = 180.0) -> bool:
    """The axon TPU tunnel can wedge (execution hangs indefinitely while
    compiles still answer).  Probe a trivial op in a daemon thread; on
    timeout, fall back to CPU so the bench still reports."""
    import threading

    ok = []

    def probe():
        try:
            jax.jit(lambda x: x + 1)(jnp.ones(3)).block_until_ready()
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if os.environ.get("BENCH_CPU_FALLBACK") == "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    backend = jax.default_backend()
    if backend != "cpu" and os.environ.get("BENCH_CPU_FALLBACK") != "1":
        if not _accelerator_responsive():
            print("# accelerator unresponsive; re-running bench on CPU",
                  file=sys.stderr)
            env = dict(os.environ, BENCH_CPU_FALLBACK="1")
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)
    mode = "matmul" if backend == "tpu" else "fft"
    # TPU-native configuration: f32 time stepping (native MXU speed; f64 is
    # emulated on TPU), f64 cache/outputs. Golden accuracy is in the same
    # 1e-4 band either way (test_golden_e2e.py::test_float32_stepping_mode).
    dtype = os.environ.get(
        "BENCH_DTYPE", "float32" if backend == "tpu" else "float64")
    cfg = SolverConfig(fft_mode=mode, dtype=dtype)
    settings = RunSettings(one_loop=True,
                           z_out=(5.0, 4.0, 3.0, 2.0, 1.0, 0.5, 0.0))

    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(BATCH)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * BATCH))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = jax.jit(jax.vmap(lambda c, l: mdl.prepare_model(cfg, c, l)))
        cosmos_c = jax.device_put(cosmos, cpu)
        lins_c = jax.device_put(lins, cpu)
        ms = prep(cosmos_c, lins_c)            # compile + warm
        jax.block_until_ready(ms)

    dev = jax.devices()[0]
    ec = jax.device_put(engine_consts(cfg, mode), dev)
    sv = jax.jit(jax.vmap(
        lambda m, e: driver.solve(cfg, settings, m, mode=mode, ec=e),
        in_axes=(0, None)))

    ms_dev = jax.device_put(ms, dev)
    res = sv(ms_dev, ec)                       # compile + warm
    res.table.block_until_ready()

    # timed: the full pipeline as a user would run a fresh batch
    t0 = time.time()
    ms = prep(cosmos_c, lins_c)
    jax.block_until_ready(ms)
    ms_dev = jax.device_put(ms, dev)
    res = sv(ms_dev, ec)
    res.table.block_until_ready()
    dt = time.time() - t0

    assert np.all(np.isfinite(np.asarray(res.table)))
    per_min = BATCH / dt * 60.0
    print(json.dumps({
        "metric": f"cosmologies/min (Time-RG+TNS 1-loop, nk=128, "
                  f"7 z-outputs, batch={BATCH}, {cfg.dtype} stepping, "
                  f"solve on {backend})",
        "value": round(per_min, 2),
        "unit": "cosmologies/min",
        "vs_baseline": round(per_min / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
