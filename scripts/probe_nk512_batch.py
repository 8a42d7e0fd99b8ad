#!/usr/bin/env python
"""Harvest the nk=512 cost-law headroom (round-4 VERDICT item 1).

The measured affine RHS cost law T(n) = 4.4 ms + 0.72 ms x n
(docs/TPU_NOTES.md "nk=512 cost law") says batch amortization of the
shared Ozaki packs buys 38 -> ~52/min as chunks grow.  This probe
measures the END-TO-END run_batch throughput of the HIGH_ACCURACY tier
across (batch, chunk) points, and A/Bs the packed work-queue scheduler
(whose heterogeneity trade differs at the 267-attempt lockstep-max of
this grid from the nk=128 measurements that rejected it).

Usage: probe_nk512_batch.py [--points 64:32,64:64] [--packed-lanes 8,16]
                            [--batch 64] [--repeats 2]
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
from redtime_tpu import design, driver  # noqa: E402
from redtime_tpu.config import (CosmoParams, RunSettings,  # noqa: E402
                                SolverConfig)

Z_OUT_PROD = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def timed_e2e(cfg, settings, cosmos, lins, mode, n, repeats, **kw):
    res = driver.run_batch(cfg, settings, cosmos, lins, mode=mode, **kw)
    res.table.block_until_ready()
    _ = np.asarray(res.table[:1, :1, :1, :1])   # force tunnel sync
    rates = []
    for _i in range(repeats):
        t0 = time.time()
        res = driver.run_batch(cfg, settings, cosmos, lins, mode=mode,
                               **kw)
        res.table.block_until_ready()
        _ = np.asarray(res.table[:1, :1, :1, :1])
        rates.append(n / (time.time() - t0) * 60.0)
    assert len(driver.finite_report(res)) == 0
    return float(np.median(rates)), min(rates), max(rates)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="64:32,64:64",
                    help="comma list of batch:chunk points")
    ap.add_argument("--packed-lanes", default="",
                    help="comma list of lane counts for the packed A/B "
                    "(empty = skip)")
    ap.add_argument("--segmented-points", default="",
                    help="comma list of batch:chunk points for the "
                    "segmented (per-interval dispatch) scheduler")
    ap.add_argument("--seg-breaks", default="",
                    help="comma list of extra eta breakpoints for the "
                    "segmented scheduler (bounds the worst program)")
    ap.add_argument("--batch", type=int, default=64,
                    help="batch size for the packed A/B")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    backend = jax.default_backend()
    mode = "matmul" if backend == "tpu" else "fft"
    cfg = SolverConfig.high_accuracy(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT_PROD)
    print(f"backend {backend}, nk={cfg.nk}, tol ({cfg.eabs_P}, "
          f"{cfg.erel_P})")

    lin = _example_inputs(cfg)
    points = [tuple(int(x) for x in p.split(":"))
              for p in args.points.split(",") if p]
    lanes_list = [int(x) for x in args.packed_lanes.split(",") if x]
    seg_b = [int(p.split(":")[0])
             for p in args.segmented_points.split(",") if p]
    nmax = max([b for b, _ in points] + seg_b
               + [args.batch if lanes_list else 0])
    rows = design.models_from_unit_cube(
        design.latin_hypercube(nmax, seed=42))
    cosmos_all = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_design_cosmo(r) for r in rows])

    def sub(n):
        c = jax.tree_util.tree_map(lambda x: x[:n], cosmos_all)
        ls = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *([lin] * n))
        return c, ls

    for batch, chunk in points:
        cosmos, lins = sub(batch)
        med, lo, hi = timed_e2e(cfg, settings, cosmos, lins, mode, batch,
                                args.repeats, max_chunk=chunk)
        print(f"chunked batch {batch:3d} chunk {chunk:3d}: "
              f"{med:6.1f}/min (spread {lo:.1f}..{hi:.1f})")

    for lanes in lanes_list:
        cosmos, lins = sub(args.batch)
        med, lo, hi = timed_e2e(cfg, settings, cosmos, lins, mode,
                                args.batch, args.repeats,
                                scheduler="packed", n_lanes=lanes)
        print(f"packed  batch {args.batch:3d} lanes {lanes:3d}: "
              f"{med:6.1f}/min (spread {lo:.1f}..{hi:.1f})")

    seg_points = [tuple(int(x) for x in p.split(":"))
                  for p in args.segmented_points.split(",") if p]
    breaks = tuple(float(b) for b in args.seg_breaks.split(",") if b) \
        or None
    for batch, chunk in seg_points:
        cosmos, lins = sub(batch)
        med, lo, hi = timed_e2e(cfg, settings, cosmos, lins, mode, batch,
                                args.repeats, scheduler="segmented",
                                max_chunk=chunk, seg_breaks=breaks)
        print(f"segmented batch {batch:3d} chunk {chunk:3d} "
              f"breaks {breaks}: {med:6.1f}/min "
              f"(spread {lo:.1f}..{hi:.1f})")


if __name__ == "__main__":
    main()
