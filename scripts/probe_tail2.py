#!/usr/bin/env python
"""Time the real RHS with the engine stubbed, omega_matrix alone, and the
linear RHS, to locate the ~15 ms non-engine cost per full-TRG eval."""

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

CH = 8
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
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
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    y0 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(ms)

    # linear RHS (nonlinear=False): omega + dlnP only
    lin_settings = RunSettings(one_loop=False, z_out=Z_OUT, nonlinear=False)

    def lin_rhs(model, y):
        rhs = trg.make_rhs(cfg, lin_settings, model, None, mode, ec)
        return rhs(jnp.asarray(0.1), y)

    dt, _ = timed(jax.jit(jax.vmap(lin_rhs)), ms, y0)
    print(f"linear RHS (omega + dlnP):        {dt*1e3:8.2f} ms")

    def omega_only(model):
        return trg.omega_matrix(cfg, model, jnp.asarray(0.37)).sum()

    dt, _ = timed(jax.jit(jax.vmap(omega_only)), ms)
    print(f"omega_matrix alone:               {dt*1e3:8.2f} ms")

    # full RHS with engine stubbed to constants
    import redtime_tpu.trg as trgmod
    real_engine = trgmod.compute_mode_coupling_full
    nk = cfg.nk

    def stub(cfg_, lnP, n_s, with_rsd, k, mode_, ec_):
        z = lnP[0]
        A_u = jnp.broadcast_to(z, (14, nk)) * 1e-8
        R = jnp.broadcast_to(z, (3, 8, nk)) * 1e-8
        return A_u, R, None, None

    trgmod.compute_mode_coupling_full = stub
    try:
        def stub_rhs(model, y):
            rhs = trg.make_rhs(cfg, settings, model, None, mode, ec)
            return rhs(jnp.asarray(0.1), y)

        dt, _ = timed(jax.jit(jax.vmap(stub_rhs)), ms, y0)
        print(f"full RHS, engine stubbed:         {dt*1e3:8.2f} ms")
    finally:
        trgmod.compute_mode_coupling_full = real_engine

    def full_rhs(model, y):
        rhs = trg.make_rhs(cfg, settings, model, None, mode, ec)
        return rhs(jnp.asarray(0.1), y)

    dt, _ = timed(jax.jit(jax.vmap(full_rhs)), ms, y0)
    print(f"full RHS (real engine):           {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
