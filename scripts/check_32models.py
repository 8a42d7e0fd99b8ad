#!/usr/bin/env python
"""Run reference emulator-comparison models in full-TRG mode from
injected-linear inputs and apply the reference's own golden criteria
(tests/emulator_comparison/test_models.py:86-89,156-159).

Usage: python scripts/check_32models.py [M001 M012 ...]   (default: all 32)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

import numpy as np  # noqa: E402

from redtime_tpu import driver, inject, model as mdl  # noqa: E402
from redtime_tpu.config import SolverConfig  # noqa: E402

EMU = "/root/reference/tests/emulator_comparison/output_kmax50_klogint1000"


def run_model(name, cfg, mode="fft"):
    p, lin, norm = inject.load_injected(
        cfg, f"{EMU}/params_redTime_{name}.dat", f"{EMU}/redTime_{name}.dat")
    settings, cosmo = driver.settings_from_params(p)
    res = driver.run_pipeline(cfg, settings, cosmo, lin, mode=mode,
                              norm_override=norm)
    return p, np.asarray(res.table)


def check_model(name, cfg, mode="fft"):
    blocks = inject.read_output_blocks(f"{EMU}/redTime_{name}.dat", cfg.nk)
    t0 = time.time()
    p, table = run_model(name, cfg, mode)
    dt = time.time() - t0
    k = blocks[-1, :, 0]
    h = p.h
    kphys = k * h
    mask = kphys < 0.1

    # reference criteria: P_dd (massless) / f^2-corrected P_dd (massive)
    f_nu = p.Omega_nu / p.Omega_m
    ours_pdd = table[-1, :, 7]
    ref_pdd = blocks[-1, :, 7]
    if f_nu > 1e-10:
        def corr(pdd, pcb, pnu):
            beta_p = np.sqrt(pnu / pcb) * f_nu
            f = 1.0 - f_nu + beta_p
            return pdd * f * f
        ours = corr(ours_pdd, table[-1, :, 3], table[-1, :, 6])
        ref = corr(ref_pdd, blocks[-1, :, 3], blocks[-1, :, 6])
    else:
        ours, ref = ours_pdd, ref_pdd
    rel = np.abs(ours[mask] / ref[mask] - 1.0)
    # diagnostics on other columns (z=0 block)
    dlin = np.max(np.abs(table[-1, :, 3] / blocks[-1, :, 3] - 1.0))
    dD = np.max(np.abs(table[:, :, 1] / blocks[:, :, 1] - 1.0))
    df = np.max(np.abs(table[:, :, 2] / blocks[:, :, 2] - 1.0))
    dpdd_all = np.abs(ours_pdd / ref_pdd - 1.0)
    print(f"{name}: f_nu={f_nu:.4f}  max(rel)={rel.max():.3e}  "
          f"q95={np.quantile(rel, 0.95):.3e}  "
          f"[Plin:{dlin:.1e} D:{dD:.1e} f:{df:.1e} "
          f"Pdd(all k):{dpdd_all.max():.1e}]  {dt:.1f}s")
    return rel.max(), np.quantile(rel, 0.95)


def run_batched(names, cfg, mode):
    """All models as ONE run_batch (the bench configuration): massless
    models get dummy all-ones beta tables so the batch shares shapes."""
    import jax.numpy as jnp

    loaded = [inject.load_injected(cfg, f"{EMU}/params_redTime_{n}.dat",
                                   f"{EMU}/redTime_{n}.dat") for n in names]
    settings, _ = driver.settings_from_params(loaded[0][0])
    cosmos, lins, norms = [], [], []
    for (p, lin, norm) in loaded:
        _, cosmo = driver.settings_from_params(p)
        if p.Omega_nu / p.Omega_m < 1e-10:
            z = np.asarray(p.z_interp, dtype=np.float64)
            lin = lin._replace(beta_a=1.0 / (1.0 + z),
                               beta_k=np.exp(lin.t_lnk),
                               beta_raw=np.ones((len(z), len(lin.t_lnk))))
        cosmos.append(cosmo)
        lins.append(lin)
        norms.append(norm)
    stack = lambda xs: jax.tree_util.tree_map(
        lambda *ys: jnp.stack(ys), *xs)
    t0 = time.time()
    res = driver.run_batch(cfg, settings, stack(cosmos), stack(lins),
                           mode=mode, norm_override=jnp.asarray(norms))
    res.table.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    res = driver.run_batch(cfg, settings, stack(cosmos), stack(lins),
                           mode=mode, norm_override=jnp.asarray(norms))
    res.table.block_until_ready()
    t_warm = time.time() - t0
    print(f"batch of {len(names)}: first {t_compile:.1f}s, "
          f"warm {t_warm:.2f}s ({len(names) / t_warm * 60:.0f}/min)")

    tables = np.asarray(res.table)
    worst_max = worst_q95 = 0.0
    for i, name in enumerate(names):
        p = loaded[i][0]
        blocks = inject.read_output_blocks(f"{EMU}/redTime_{name}.dat",
                                           cfg.nk)
        kphys = blocks[-1, :, 0] * p.h
        mask = kphys < 0.1
        f_nu = p.Omega_nu / p.Omega_m

        def corr(tab):
            pdd = tab[-1, :, 7]
            if f_nu < 1e-10:
                return pdd
            b = f_nu * np.sqrt(tab[-1, :, 6] / tab[-1, :, 3])
            return pdd * (1.0 - f_nu + b) ** 2

        rel = np.abs(corr(tables[i])[mask] / corr(blocks)[mask] - 1.0)
        tag = "massless" if f_nu < 1e-10 else "massive"
        ok = (rel.max() < 1e-3 if f_nu < 1e-10 else
              rel.max() < 5e-3 and np.quantile(rel, 0.95) < 1e-3)
        if f_nu >= 1e-10:
            worst_max = max(worst_max, rel.max())
            worst_q95 = max(worst_q95, np.quantile(rel, 0.95))
        print(f"{name} [{tag}] max={rel.max():.3e} "
              f"q95={np.quantile(rel, 0.95):.3e} {'OK' if ok else 'FAIL'}")
    print(f"massive worst: max={worst_max:.3e} q95={worst_q95:.3e}")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*",
                    default=[f"M{i:03d}" for i in range(1, 33)])
    ap.add_argument("--dtype", default="float64",
                    choices=["float64", "float32"])
    ap.add_argument("--mode", default="fft", choices=["fft", "matmul"])
    ap.add_argument("--tpu", action="store_true",
                    help="run the solve on the default (accelerator) device")
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"])
    ap.add_argument("--batch", action="store_true",
                    help="run all models as one vmapped run_batch")
    ap.add_argument("--engine-dtype", default="float64")
    args = ap.parse_args()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    if args.tpu:
        jax.config.update("jax_default_device", jax.devices()[0])
    cfg = SolverConfig(dtype=args.dtype,
                       engine_transform_dtype=args.engine_dtype)
    if args.batch:
        run_batched(args.names, cfg, args.mode)
        return
    worst = 0.0
    for name in args.names:
        m, _ = check_model(name, cfg, args.mode)
        worst = max(worst, m)
    print(f"worst max(rel): {worst:.3e}")


if __name__ == "__main__":
    main()
