#!/usr/bin/env python
"""Bisect the f32 full-TRG TPU fault (f64 full-TRG and f32 1-loop both run
fine; f32 full-TRG — the FAST-PT engine inside the RHS while_loop in f32 —
crashes the TPU worker).  Stages grow toward the failing executable:

  engine  — one f32 compute_mode_coupling_full (J + PZ + assembly)
  exteng  — engine from extend_power input path
  rhs     — one full-mode f32 RHS evaluation
  seg     — one integrate_interval segment (while_loop around the RHS)
  solve1  — driver.solve, single model
  batch8  — vmapped solve, batch 8

Usage: python scripts/probe_f32_fault.py STAGE [--nk 128]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import driver, model as mdl, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402


def setup(nk, dtype="float32"):
    cfg = SolverConfig(nk=nk, fft_mode="matmul", dtype=dtype)
    settings = RunSettings(one_loop=False,
                           z_out=(2.02, 1.61, 1.01, 0.66, 0.43, 0.24,
                                  0.10, 0.0))
    lin = _example_inputs(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        m = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(
            _cosmo(), lin)
        y0 = trg.initial_state(cfg, settings, m)
        jax.block_until_ready((m, y0))
    dev = jax.devices()[0]
    f32 = lambda t: jax.tree_util.tree_map(
        lambda x: (x.astype(jnp.float32)
                   if hasattr(x, "dtype")
                   and jnp.issubdtype(x.dtype, jnp.floating) else x), t)
    ec = jax.device_put(f32(engine_consts(cfg, "matmul")), dev)
    m32 = jax.device_put(f32(m), dev)
    y32 = jax.device_put(y0.astype(jnp.float32), dev)
    return cfg, settings, m32, y32, ec, dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage")
    ap.add_argument("--nk", type=int, default=128)
    args = ap.parse_args()
    cfg, settings, m, y, ec, dev = setup(args.nk)
    g_nk = cfg.nk
    k = jnp.asarray(np.exp(np.linspace(np.log(cfg.kmin), np.log(cfg.kmax),
                                       g_nk)), dtype=jnp.float32)

    if args.stage in ("engine", "exteng"):
        lnP = y.reshape(trg.NU_STATE, g_nk)[0:3]

        def f(lnP, ec):
            return trg.compute_mode_coupling_full(
                cfg, lnP, m.cosmo.n_s.astype(jnp.float32), True,
                k, "matmul", ec)
        out = jax.jit(f)(lnP, ec)
        jax.block_until_ready(out)
        fin = all(bool(jnp.all(jnp.isfinite(o))) for o in out)
        print(f"{args.stage} OK, finite={fin}")
    elif args.stage == "rhs":
        rhs = trg.make_rhs(cfg, settings, m, None, "matmul", ec)
        out = jax.jit(rhs)(jnp.asarray(1.0), y)
        jax.block_until_ready(out)
        print("rhs OK, finite=", bool(jnp.all(jnp.isfinite(out))))
    elif args.stage == "seg":
        from redtime_tpu.ode import RKF45, integrate_interval
        rhs = trg.make_rhs(cfg, settings, m, None, "matmul", ec)

        def f(y):
            return integrate_interval(rhs, 0.0, 4.198, y, 0.053,
                                      cfg.eabs_P, cfg.erel_P, RKF45,
                                      return_stats=True)
        y2, h, n = jax.jit(f)(y)
        jax.block_until_ready(y2)
        print("seg OK, attempts:", int(n), "finite:",
              bool(jnp.all(jnp.isfinite(y2))))
    elif args.stage == "solve1":
        res = driver._jitted_solve(cfg, settings, "matmul", False)(m, ec)
        res.table.block_until_ready()
        print("solve1 OK, finite lanes:",
              len(driver.finite_report(res)) == 0)
    elif args.stage == "batch8":
        mb = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * 8) if hasattr(x, "dtype") else x, m)
        res = driver._jitted_solve(cfg, settings, "matmul", True)(mb, ec)
        res.table.block_until_ready()
        print("batch8 OK, bad lanes:", list(driver.finite_report(res)))
    else:
        raise SystemExit(f"unknown stage {args.stage}")


if __name__ == "__main__":
    main()
