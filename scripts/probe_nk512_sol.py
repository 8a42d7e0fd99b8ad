#!/usr/bin/env python
"""Speed-of-light analysis of the HIGH_ACCURACY (nk=512) full-TRG RHS.

VERDICT r4 item 1 asks either >=5x over 22/min or a written proof
(element-traffic cost law + HBM numbers) that the measured number is the
hardware ceiling.  This probe produces the numbers for that proof:

  1. XLA's own cost model for the compiled vmapped RHS
     (compiled.cost_analysis(): bytes accessed, flops) per chunk size,
  2. a measured HBM streaming bandwidth on this chip (big-array triad),
  3. the measured per-eval wall time,
  -> efficiency = speed-of-light time / measured time, and the implied
     end-to-end ceiling at the lockstep attempt count.

Usage: probe_nk512_sol.py [--chunks 4,16] [--bits N] [--preset P]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _example_inputs  # noqa: E402
from redtime_tpu import design, driver, fastpt, model as mdl, trg  # noqa: E402
from redtime_tpu.config import (CosmoParams, RunSettings,  # noqa: E402
                                SolverConfig)

Z_OUT_PROD = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def hbm_bw_measure():
    """Measured streaming bandwidth: a dependency CHAIN of adds on a
    512 MB f32 operand inside one jit (reads 1 GB, writes 0.5 GB per
    link; the chain prevents elision/overlap — a loop of independent
    adds measured an impossible 52 TB/s on this runtime)."""
    n = 128 * 1024 * 1024  # 512 MB per array
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 1e-9, jnp.float32)
    links = 10

    @jax.jit
    def chain(a, b):
        for _ in range(links):
            a = jax.lax.optimization_barrier(a + b)
        return a

    # NOTE: on the axon tunnel backend block_until_ready does NOT
    # reliably block (measured: a 1-rep "blocked" call returned in
    # 0.25 ms and the subsequent host fetch took the real time), so
    # every timing here ends with a tiny HOST FETCH to force sync.
    r = chain(a, b)
    _ = np.asarray(r[:1])
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        r = chain(a, b)
    _ = np.asarray(r[:1])
    dt = (time.time() - t0) / (reps * links)
    bw = 3 * 4 * n / dt  # 2 reads + 1 write per link
    return bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="4,16")
    ap.add_argument("--bits", type=int, default=0)
    ap.add_argument("--preset", default="high-accuracy",
                    choices=("high-accuracy", "v01-compat", "default"))
    ap.add_argument("--attempts", type=int, default=267,
                    help="lockstep-max step attempts for the implied "
                    "end-to-end ceiling (267 = nk=512 preset tolerances, "
                    "probe_nk512_legs; measure with probe_nk512_legs "
                    "--attempts for other presets)")
    args = ap.parse_args()

    backend = jax.default_backend()
    mode = "matmul" if backend == "tpu" else "fft"
    mk = {"high-accuracy": SolverConfig.high_accuracy,
          "v01-compat": SolverConfig.v01_compat,
          "default": SolverConfig}[args.preset]
    cfg = mk(fft_mode=mode, oz_bits=args.bits)
    print(f"backend {backend}, preset {args.preset}, nk={cfg.nk} "
          f"np={cfg.np_factor * cfg.nk}, bits={args.bits}")
    print(f"oz pack bytes: {fastpt._oz_leg_bytes(cfg)}")

    bw = hbm_bw_measure()
    print(f"measured HBM streaming BW: {bw / 1e9:.0f} GB/s")

    settings = RunSettings(one_loop=False, z_out=Z_OUT_PROD)
    lin = _example_inputs(cfg)
    nmax = max(int(c) for c in args.chunks.split(","))
    rows = design.models_from_unit_cube(design.latin_hypercube(nmax, seed=42))
    ec = fastpt.engine_consts(cfg, mode)

    for chunk in (int(c) for c in args.chunks.split(",")):
        cosmos = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[_design_cosmo(r)
                                         for r in rows[:chunk]])
        lins = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *([lin] * chunk))
        ms = jax.vmap(lambda c, l: mdl.prepare_model(cfg, c, l))(cosmos, lins)
        nk = cfg.nk
        y0 = jnp.zeros((chunk, trg.NU_STATE * nk), jnp.float64) - 1.0

        def one_rhs(model, y, ec):
            rhs = trg.make_rhs(cfg, settings, model, None, mode, ec)
            return rhs(jnp.asarray(0.1), y)

        fn = jax.jit(jax.vmap(one_rhs, in_axes=(0, 0, None)))
        lowered = fn.lower(ms, y0, ec)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        nbytes = float(ca.get("bytes accessed", 0.0))
        flops = float(ca.get("flops", 0.0))
        out = compiled(ms, y0, ec)
        _ = np.asarray(out[:1, :1])     # force sync (see hbm_bw_measure)
        reps = 60
        t0 = time.time()
        for _ in range(reps):
            out = compiled(ms, y0, ec)
        _ = np.asarray(out[:1, :1])
        dt = (time.time() - t0) / reps
        sol = nbytes / bw
        print(f"chunk {chunk:3d}: bytes/eval {nbytes / 1e9:.2f} GB, "
              f"flops {flops / 1e12:.2f} T, SoL {sol * 1e3:.1f} ms, "
              f"measured {dt * 1e3:.1f} ms, HBM efficiency "
              f"{sol / dt * 100:.0f}%")
        # implied end-to-end ceiling at the lockstep attempt count
        attempts = args.attempts
        ceiling = chunk / (attempts * 6 * sol) * 60
        meas = chunk / (attempts * 6 * dt) * 60
        print(f"           implied solve-only: SoL {ceiling:.0f}/min, "
              f"at measured eval {meas:.0f}/min (attempts={attempts} x6)")


if __name__ == "__main__":
    main()
