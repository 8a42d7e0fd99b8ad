#!/usr/bin/env python
"""Decompose the RHS cost OUTSIDE the mode-coupling engine.

The engine (compute_mode_coupling_full incl. assembly) measures 0.96 ms
in-loop at chunk 8, but the full RHS is 2.35 ms — this isolates the
tail: omega_matrix (beta_P interpolation), the one-hot Omega
contractions, and the elementwise dlnP/dI/dQ chain.
"""

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
from redtime_tpu import assembly, driver, model as mdl, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

CH = 8
N_ITER = 50
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def inloop_time(step, y0, n=N_ITER, reps=3):
    @jax.jit
    def run(y):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), y)

    out = run(y0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * n)


def main():
    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(CH)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * CH))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = driver._jitted_prepare(cfg, True)
        ms = prep(jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)
    y0 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(ms)
    nk = cfg.nk

    def wrap(stage_fn):
        def step(y):
            def one(m, yy):
                r = stage_fn(m, yy)
                out = jnp.zeros_like(yy.reshape(trg.NU_STATE, nk))
                out = out.at[3].set(r[:nk])
                return out.reshape(-1)
            dy = jax.vmap(one)(ms, y)
            return y * 0.999 + y0 * 0.001 + 1e-12 * dy
        return step

    # full RHS (reference point)
    def st_rhs(m, yy):
        rhs = trg.make_rhs(cfg, settings, m, None, mode, ec)
        return rhs(jnp.asarray(0.3), yy)[:nk]

    # omega_matrix alone (beta_P interpolation + background scalars)
    def st_omega(m, yy):
        eta = yy[0] * 0.0 + 0.3
        a = settings.a_in * jnp.exp(eta)
        O = trg.omega_matrix(cfg, m, a)
        return O.sum(axis=(0, 1))

    # linear RHS (no engine, no I/Q): dlnP chain + omega
    settings_lin = RunSettings(one_loop=False, nonlinear=False, z_out=Z_OUT)

    def st_lin(m, yy):
        rhs = trg.make_rhs(cfg, settings_lin, m, None, mode, ec)
        return rhs(jnp.asarray(0.3), yy)[:nk]

    # the one-hot Omega contraction block alone (I/Q tails, no engine)
    PI, QI, TR14, PQm, QQm = (jnp.asarray(m, dtype=cfg.jdtype)
                              for m in assembly.OMEGA_MATS)

    def st_onehot(m, yy):
        eta = jnp.asarray(0.3)
        y = yy.reshape(trg.NU_STATE, nk)
        a = settings.a_in * jnp.exp(eta)
        O = trg.omega_matrix(cfg, m, a)
        Of = O.reshape(4, nk)
        I14 = y[trg.NUP:trg.NUP + trg.NUI]
        Q24 = y[trg.NUP + trg.NUI:]
        t = ((QI @ Of) * (PI @ I14)).reshape(6, trg.NUI, nk).sum(axis=0)
        qt = ((QQm @ Of) * (PQm @ Q24)).reshape(6, trg.NUQ, nk).sum(axis=0)
        Isum = (TR14 @ I14).reshape(2, 2, nk)
        return t.sum(axis=0) + qt.sum(axis=0) + Isum.sum(axis=(0, 1))

    for name, fn in [("omega", st_omega), ("onehot", st_onehot),
                     ("lin", st_lin), ("rhs", st_rhs)]:
        dt = inloop_time(wrap(fn), y0)
        print(f"{name:7s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
