#!/usr/bin/env python
"""Chunked vs packed scheduler on a HETEROGENEOUS (LHS design) batch.

The chunked scheduler pays max-over-lanes step attempts per segment
(lockstep); the packed work-queue scheduler lets each lane follow its own
controller trajectory.  On homogeneous batches the waste is only ~15%
and chunked wins e2e via host-prepare overlap; this measures the real
production case — a Mira-Titan-style LHS design where stiffness varies
across cosmologies (scripts/runRedTimeBatch's model files).

Usage: python scripts/bench_sched_hetero.py [N] [--chunk C] [--lanes L]
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

from __graft_entry__ import _example_inputs  # noqa: E402
from redtime_tpu import design, driver  # noqa: E402
from redtime_tpu.config import CosmoParams, RunSettings, SolverConfig  # noqa: E402

Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def lhs_cosmos(n: int, seed: int = 0):
    """CosmoParams batch from the Mira-Titan LHS design (little-omegas
    -> Omegas by /h^2, the runRedTime derivation, scripts/runRedTime:
    107-114)."""
    m = design.models_from_unit_cube(design.latin_hypercube(n, 8, seed))
    cs = []
    for om_m, om_b, s8, h, ns, w0, wa, om_nu in m:
        cs.append(CosmoParams.make(
            n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
            T_cmb=2.726, w0=w0, wa=wa))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=32)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--skip", choices=["chunked", "packed", "none"],
                    default="none")
    args = ap.parse_args()
    n = args.n

    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = lhs_cosmos(n)
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * n))

    def timed(scheduler, **kw):
        res = driver.run_batch(cfg, settings, cosmos, lins, mode,
                               scheduler=scheduler, **kw)
        res.table.block_until_ready()
        t0 = time.time()
        res = driver.run_batch(cfg, settings, cosmos, lins, mode,
                               scheduler=scheduler, **kw)
        res.table.block_until_ready()
        dt = time.time() - t0
        bad = driver.finite_report(res)
        print(f"{scheduler}: {dt:.2f}s -> {n / dt * 60:.0f}/min"
              + (f"  NONFINITE lanes {list(bad)}" if len(bad) else ""),
              flush=True)
        return res

    os.environ["REDTIME_LANES"] = str(args.lanes)
    if args.skip != "chunked":
        r_c = timed("chunked", max_chunk=args.chunk)
    if args.skip != "packed":
        r_p = timed("packed")
    if args.skip == "none":
        d = np.abs(np.asarray(r_c.table) - np.asarray(r_p.table)).max()
        s = np.abs(np.asarray(r_c.table)).max()
        print(f"max |chunked - packed| = {d:.3e} (scale {s:.3e})")


if __name__ == "__main__":
    main()
