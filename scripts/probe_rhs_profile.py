#!/usr/bin/env python
"""Decompose the full-TRG solve cost on the live accelerator.

Measures, at a given chunk size (vmapped batch):
  * total RK step ATTEMPTS across all 8 output segments,
  * wall time of ONE rk_step (6 RHS evals) as its own jit,
  * wall time of ONE RHS eval,
  * wall time of the mode-coupling engine alone (the RHS minus the
    Omega/I/Q einsum tail),
and reconciles attempts x step-time against the measured solve time.
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
from redtime_tpu import driver, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import compute_J_PZ, engine_consts  # noqa: E402
from redtime_tpu.ode import RKF45, integrate_interval, rk_step  # noqa: E402
from redtime_tpu.trg import compute_mode_coupling_full, make_rhs  # noqa: E402

Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--asm", default="auto",
                    choices=("auto", "direct", "matmul"))
    args = ap.parse_args()
    chunk = args.chunk

    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode, asm_leg=args.asm)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(chunk)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * chunk))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = driver._jitted_prepare(cfg, True)
        ms = prep(jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)

    # --- step attempts per segment (vmapped solve with stats)
    etasteps = np.asarray(settings.etasteps())
    t0s = np.concatenate([[0.0], etasteps[:-1]])
    segs = jnp.stack([jnp.asarray(t0s), jnp.asarray(etasteps)], axis=1)

    def solve_stats(model):
        rhs = make_rhs(cfg, settings, model, None, mode, ec)
        y = trg.initial_state(cfg, settings, model)
        h = 1e-2 * float(np.log(1.0 / settings.a_in))

        def seg(carry, t0t1):
            y, h = carry
            y2, h2, n = integrate_interval(rhs, t0t1[0], t0t1[1], y, h,
                                           cfg.eabs_P, cfg.erel_P, RKF45,
                                           return_stats=True)
            return (y2, h2), n

        (_, _), ns = jax.lax.scan(seg, (y, jnp.asarray(h)), segs)
        return ns

    f_stats = jax.jit(jax.vmap(solve_stats))
    dt_solve, ns = timed(f_stats, ms, reps=3)
    ns = np.asarray(ns)
    print(f"solve+stats (chunk {chunk}): {dt_solve:.2f}s "
          f"-> {chunk / dt_solve * 60:.0f}/min")
    print(f"attempts per segment (per model):\n{ns}")
    # lockstep cost = sum over segments of the max over models;
    # (an earlier revision summed max-over-segments per model — 4x too
    # high, which motivated the packed scheduler experiment)
    print(f"total attempts (lockstep max per seg): "
          f"{int(ns.max(axis=0).sum())}; per-model mean "
          f"{ns.sum(axis=1).mean():.0f}")

    # --- one rk_step
    m0 = ms
    y0 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(m0)

    def one_step(model, y):
        rhs = make_rhs(cfg, settings, model, None, mode, ec)
        yn, ye = rk_step(rhs, jnp.asarray(0.1), jnp.asarray(1e-3), y, RKF45)
        return yn

    f_step = jax.jit(jax.vmap(one_step))
    dt_step, _ = timed(f_step, m0, y0, reps=10)
    print(f"\none rk_step (6 RHS): {dt_step*1e3:.1f} ms "
          f"-> attempts x step = "
          f"{ns.max(axis=1).sum() * dt_step:.2f}s (vs {dt_solve:.2f}s)")

    def one_rhs(model, y):
        rhs = make_rhs(cfg, settings, model, None, mode, ec)
        return rhs(jnp.asarray(0.1), y)

    f_rhs = jax.jit(jax.vmap(one_rhs))
    dt_rhs, _ = timed(f_rhs, m0, y0, reps=10)
    print(f"one RHS eval: {dt_rhs*1e3:.1f} ms")

    # --- engine alone (A/R assembly from current lnP)
    nk = cfg.nk
    k = jnp.asarray(trg.make_grids(cfg).k)

    def engine_only(model, y):
        lnP = y.reshape(trg.NU_STATE, nk)[0:3]
        A_u, R, PT, PMR = compute_mode_coupling_full(
            cfg, lnP, model.cosmo.n_s, True, k, mode, ec)
        return A_u.sum() + R.sum()

    f_eng = jax.jit(jax.vmap(engine_only))
    dt_eng, _ = timed(f_eng, m0, y0, reps=10)
    print(f"engine only (J/PZ + A/R/PT/PMR assembly): {dt_eng*1e3:.1f} ms")

    # --- J/PZ transforms alone (no assembly)
    from redtime_tpu.fastpt import extend_power

    def jpz_only(model, y):
        lnP = y.reshape(trg.NU_STATE, nk)[0:3]
        Pext = extend_power(cfg, lnP, model.cosmo.n_s, ec)
        J, PZ = compute_J_PZ(cfg, Pext, True, mode, ec)
        return J.sum() + PZ.sum()

    f_jpz = jax.jit(jax.vmap(jpz_only))
    dt_jpz, _ = timed(f_jpz, m0, y0, reps=10)
    print(f"J/PZ transforms only: {dt_jpz*1e3:.1f} ms")


if __name__ == "__main__":
    main()
