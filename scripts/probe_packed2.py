#!/usr/bin/env python
"""Isolate the packed loop's per-iteration overhead.

Variants (all 100 fixed iterations, 8 lanes, real models/RHS):
  bare   : vmapped rk attempt + controller masking only
  outloc : + one-hot segment recording
  cond   : + identity lax.cond threading the full state
  flush  : + cond with the real reload branch (pred always False)
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
from redtime_tpu import driver, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402
from redtime_tpu.ode import RKF45, rk_step  # noqa: E402

N, L = 32, 8
ITERS = 100
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def main():
    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(N)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * N))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ms = driver._jitted_prepare(cfg, True)(
            jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)
    g = trg.make_grids(cfg)
    nk = g.nk
    nflat = trg.NU_STATE * nk
    S = len(Z_OUT)
    etasteps = jnp.asarray(settings.etasteps())
    m0 = jax.tree_util.tree_map(lambda x: x[:L], ms)
    y00 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(m0)
    y00 = y00.reshape(L, nflat)

    def lane_attempt(m, t, h, y, t1):
        rhs = trg.make_rhs(cfg, settings, m, None, mode, ec)
        dt = t1 - t
        final = h > dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr = rk_step(rhs, t, h_try, y, RKF45)
        d0 = cfg.eabs_P + cfg.erel_P * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)
        dec = r > 1.1
        fac = jnp.where(dec, jnp.maximum(0.9 * r ** (-0.2), 0.2),
                        jnp.where(r < 0.5,
                                  jnp.clip(0.9 * r ** (-1.0 / 6), 1, 5),
                                  1.0))
        h_next = h_try * fac
        t_out = jnp.where(dec, t, jnp.where(final, t1, t + h_try))
        y_out = jnp.where(dec, y, y_new)
        return t_out, y_out, h_next, final & ~dec

    def run_variant(which):
        def body(i, st):
            m, t, h, y, seg, midx, outloc, active, counter, outg = st
            t1 = etasteps[jnp.minimum(seg, S - 1)]
            tn, yn, hn, reached = jax.vmap(lane_attempt)(m, t, h, y, t1)
            t = jnp.where(active, tn, t)
            h = jnp.where(active, hn, h)
            y = jnp.where(active[:, None], yn, y)
            reached = reached & active
            if which in ("outloc", "cond", "flush"):
                oh = ((jnp.arange(S)[None, :] == seg[:, None])
                      & reached[:, None])
                outloc = jnp.where(oh[..., None], y[:, None, :], outloc)
            seg2 = seg + reached.astype(seg.dtype)
            # never actually reaches S in 100 iters from t=0 8 segs...
            seg = jnp.minimum(seg2, S - 1)
            st = (m, t, h, y, seg, midx, outloc, active, counter, outg)
            if which == "cond":
                st = jax.lax.cond(jnp.any(seg < 0), lambda a: a,
                                  lambda a: a, st)
            return st

        st0 = (m0,
               jnp.zeros(L, jnp.float64),
               jnp.full(L, jnp.float64(0.05)),
               y00,
               jnp.zeros(L, jnp.int32),
               jnp.arange(L, dtype=jnp.int32),
               jnp.zeros((L, S, nflat), jnp.float64),
               jnp.ones(L, bool),
               jnp.asarray(L, jnp.int32),
               jnp.zeros((N, S, nflat), jnp.float64))
        f = jax.jit(lambda s: jax.lax.fori_loop(0, ITERS, body, s))
        out = f(st0)
        jax.block_until_ready(out)
        t0 = time.time()
        out = f(out)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / ITERS
        print(f"  {which:7s}: {dt*1e3:6.2f} ms/iter")

    for which in ("bare", "outloc", "cond"):
        run_variant(which)


if __name__ == "__main__":
    main()
