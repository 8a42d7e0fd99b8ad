#!/usr/bin/env python
"""Probe one-dispatch batch sizes (full-TRG, f64, nk=128).

Round-2 history: batches > 32 in a single dispatch APPEARED to fault the
axon TPU runtime.  The real mechanism (found by bisecting to single
cosmologies) was not dispatch size: the synthetic `_cosmo(i)` sweep
reaches early-DE-dominated parameters (w0 + wa > 1/3) at i >~ 53, whose
growth-table common scale exceeds the f32 exponent ceiling of the TPU's
emulated f64 — device_put landed inf and enough NaN lanes crashed the
worker.  Fixed by the prepare_model table rescale (exact no-op for
physical models); one dispatch of 64 now completes.  This probe remains
the subprocess-isolated harness for re-checking dispatch scaling.

Usage: python scripts/probe_batch_fault.py [--sizes 32,40,48,64]
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", %(repo)r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from __graft_entry__ import _cosmo, _example_inputs
from redtime_tpu import driver
from redtime_tpu.config import RunSettings, SolverConfig

B = %(batch)d
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)
mode = "matmul" if jax.default_backend() == "tpu" else "fft"
cfg = SolverConfig(fft_mode=mode)
settings = RunSettings(one_loop=False, z_out=Z_OUT)
lin = _example_inputs(cfg)
cosmos = jax.tree_util.tree_map(
    lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(B)])
lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * B))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    ms = driver._jitted_prepare(cfg, True)(
        jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
    jax.block_until_ready(ms)
dev = jax.devices()[0]
ms = jax.device_put(ms, dev)
sv = driver._jitted_solve(cfg, settings, mode, True)
ec = driver._device_ec(cfg, mode, dev)
t0 = time.time()
res = sv(ms, ec)
res.table.block_until_ready()
t_cold = time.time() - t0
t0 = time.time()
res = sv(ms, ec)
res.table.block_until_ready()
t_warm = time.time() - t0
bad = driver.finite_report(res)
print(f"OK batch={B} cold={t_cold:.1f}s warm={t_warm:.1f}s "
      f"({B / t_warm * 60:.0f}/min solve-only) nonfinite={list(bad)}")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,36,40,48,64")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    results = {}
    for b in [int(s) for s in args.sizes.split(",")]:
        code = CHILD % {"repo": REPO, "batch": b}
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=args.timeout)
            ok = [l for l in r.stdout.splitlines()
                  if l.startswith("OK batch")]
            tail = ok + [l for l in r.stderr.strip().splitlines()[-6:]
                         if "cpu_aot_loader" not in l]
            results[b] = {"rc": r.returncode, "tail": tail}
            print(f"batch {b}: rc={r.returncode}  "
                  f"{tail[0] if tail else ''}", flush=True)
        except subprocess.TimeoutExpired:
            results[b] = {"rc": None, "tail": ["TIMEOUT"]}
            print(f"batch {b}: TIMEOUT", flush=True)
        if results[b]["rc"] not in (0,):
            break            # a faulted worker may wedge the tunnel
    out = os.path.join(REPO, "docs", "batch_fault_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
