#!/usr/bin/env python
"""Probe: HIGH_ACCURACY (nk=512) full-TRG throughput + accuracy on TPU.

Round-2 state: the Ozaki packs silently failed the 1 GB budget at nk=512,
dropping every MXU leg -> 4.65 cosmologies/min.  Round 3 raises the auto
budget (fastpt.OZ_AUTO_BUDGET) and selects legs individually, so this
measures:

  1. throughput with the Ozaki legs engaged (the new default),
  2. [--dot] throughput with the legs forced off (the round-2 state),
  3. [--acc] Ozaki vs emulated-f64 dot engine agreement on one model.

Usage: probe_nk512.py [--batch N] [--dot] [--acc] [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _example_inputs  # noqa: E402
from redtime_tpu import design, driver, fastpt  # noqa: E402
from redtime_tpu.config import (CosmoParams, RunSettings,  # noqa: E402
                                SolverConfig)

Z_OUT_PROD = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def _inputs(cfg, n):
    lin = _example_inputs(cfg)
    rows = design.models_from_unit_cube(design.latin_hypercube(n, seed=42))
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_design_cosmo(r) for r in rows[:n]])
    lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * n))
    return cosmos, lins


def timed(cfg, settings, cosmos, lins, mode, n):
    t0 = time.time()
    res = driver.run_batch(cfg, settings, cosmos, lins, mode=mode)
    res.table.block_until_ready()
    warm = time.time() - t0
    t0 = time.time()
    res = driver.run_batch(cfg, settings, cosmos, lins, mode=mode)
    res.table.block_until_ready()
    dt = time.time() - t0
    bad = driver.finite_report(res)
    print(f"  warm(compile) {warm:.1f}s, timed {dt:.1f}s -> "
          f"{n / dt * 60:.2f} cosmologies/min, bad lanes: {list(bad)}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dot", action="store_true")
    ap.add_argument("--acc", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="engine_transform_dtype=float32 route")
    ap.add_argument("--bits", type=int, default=0,
                    help="oz_bits pack truncation (0 = full coverage)")
    ap.add_argument("--tableau", default="rkf45",
                    choices=("rkf45", "dopri5", "dop853"),
                    help="eta integrator tableau")
    ap.add_argument("--preset", default="high-accuracy",
                    choices=("high-accuracy", "v01-compat"),
                    help="big-grid preset to measure")
    ap.add_argument("--chunk", type=int, default=0,
                    help="override run_batch max_chunk (0 = default)")
    args = ap.parse_args()

    backend = jax.default_backend()
    mode = "matmul" if backend == "tpu" else "fft"
    print(f"backend {backend}, mode {mode}")

    mk = {"high-accuracy": SolverConfig.high_accuracy,
          "v01-compat": SolverConfig.v01_compat}[args.preset]
    cfg = mk(fft_mode=mode, oz_bits=args.bits, eta_tableau=args.tableau)
    if args.chunk:
        os.environ["REDTIME_MAX_CHUNK"] = str(args.chunk)
    if args.f32:
        cfg = dataclasses.replace(cfg, engine_transform_dtype="float32")
    if args.dot:
        cfg = dataclasses.replace(cfg, out_leg="dot", tab_leg="dot",
                                  pz_leg="dot", fwd_leg="dot")
    print(f"oz legs enabled: {sorted(fastpt._oz_enabled(cfg))}, "
          f"bytes {fastpt._oz_leg_bytes(cfg)}")
    settings = RunSettings(one_loop=False, z_out=Z_OUT_PROD)
    n = args.batch
    cosmos, lins = _inputs(cfg, n)

    print(f"nk={cfg.nk} ({args.preset}) full-TRG batch={n} "
          f"({'dot' if args.dot else 'ozaki'}"
          f"{'/f32' if args.f32 else ''}"
          f"{f'/bits{args.bits}' if args.bits else ''}"
          f"/{args.tableau}):")
    res = timed(cfg, settings, cosmos, lins, mode, n)

    if args.acc:
        cfg_dot = dataclasses.replace(cfg, out_leg="dot", tab_leg="dot",
                                      pz_leg="dot", fwd_leg="dot")
        c1 = jax.tree_util.tree_map(lambda x: x[:1], cosmos)
        l1 = jax.tree_util.tree_map(lambda x: x[:1], lins)
        r_oz = driver.run_batch(cfg, settings, c1, l1, mode=mode)
        r_dd = driver.run_batch(cfg_dot, settings, c1, l1, mode=mode)
        a = np.asarray(r_oz.table)
        b = np.asarray(r_dd.table)
        scale = np.max(np.abs(b), axis=-2, keepdims=True) + 1e-300
        print(f"  ozaki vs dot engine: max col-scale dev "
              f"{np.max(np.abs(a - b) / scale):.3e}")
    del res


if __name__ == "__main__":
    main()
