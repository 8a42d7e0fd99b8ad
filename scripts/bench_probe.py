#!/usr/bin/env python
"""Timing probes for the production (full-TRG) TPU configuration.

Usage: python scripts/bench_probe.py CHUNK [--on-device-prep] [--dtype D]
Times host-prepare and device-solve separately, then the overlapped
run_batch path, at the given chunk size.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import driver  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

BATCH = 32
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("chunk", type=int)
    ap.add_argument("--on-device-prep", action="store_true")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--engine-dtype", default="float64")
    ap.add_argument("--one-loop", action="store_true")
    args = ap.parse_args()

    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode, dtype=args.dtype,
                       engine_transform_dtype=args.engine_dtype)
    settings = RunSettings(one_loop=args.one_loop, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(BATCH)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * BATCH))

    # prep-only timing (host CPU, vmapped, the run_batch host path)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = driver._jitted_prepare(cfg, True)
        cs_c = jax.device_put(cosmos, cpu)
        ls_c = jax.device_put(lins, cpu)
        ms = prep(cs_c, ls_c)
        jax.block_until_ready(ms)
        t0 = time.time()
        ms = prep(cs_c, ls_c)
        jax.block_until_ready(ms)
        t_prep = time.time() - t0
    print(f"host prep (batch {BATCH}): {t_prep:.2f}s")

    # solve-only timing at the chunk size (device)
    dev = jax.devices()[0]
    ec = jax.device_put(engine_consts(cfg, mode), dev)
    sv = driver._jitted_solve(cfg, settings, mode, True)
    mc = jax.tree_util.tree_map(lambda x: x[:args.chunk], ms)
    mc = jax.device_put(mc, dev)
    res = sv(mc, ec)
    res.table.block_until_ready()
    t0 = time.time()
    res = sv(mc, ec)
    res.table.block_until_ready()
    t_solve = time.time() - t0
    print(f"device solve (chunk {args.chunk}): {t_solve:.2f}s "
          f"-> {args.chunk / t_solve * 60:.0f}/min solve-only")
    assert len(driver.finite_report(res)) == 0

    # full overlapped path
    poh = not args.on_device_prep
    r = driver.run_batch(cfg, settings, cosmos, lins, mode=mode,
                         prepare_on_host=poh, max_chunk=args.chunk)
    r.table.block_until_ready()
    t0 = time.time()
    r = driver.run_batch(cfg, settings, cosmos, lins, mode=mode,
                         prepare_on_host=poh, max_chunk=args.chunk)
    r.table.block_until_ready()
    dt = time.time() - t0
    print(f"run_batch chunk={args.chunk} prep_on_host={poh}: {dt:.2f}s "
          f"-> {BATCH / dt * 60:.0f}/min end-to-end")
    assert len(driver.finite_report(r)) == 0


if __name__ == "__main__":
    main()
