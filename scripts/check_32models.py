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
    args = ap.parse_args()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)
    if args.tpu:
        jax.config.update("jax_default_device", jax.devices()[0])
    cfg = SolverConfig(dtype=args.dtype)
    worst = 0.0
    for name in args.names:
        m, _ = check_model(name, cfg, args.mode)
        worst = max(worst, m)
    print(f"worst max(rel): {worst:.3e}")


if __name__ == "__main__":
    main()
