#!/usr/bin/env python
"""Compare the full pipeline against the reference's bundled golden output.

Usage: python scripts/golden_check.py [--mode fft|matmul]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

from redtime_tpu import SolverConfig, run_pipeline, settings_from_params  # noqa: E402
from redtime_tpu.io import read_params_file  # noqa: E402
from redtime_tpu.io.camb import load_from_params  # noqa: E402

EX = "/root/reference/examples/1_redTime"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fft")
    args = ap.parse_args()

    p = read_params_file(f"{EX}/params_redTime.dat")
    lin = load_from_params(p, EX)
    settings, cosmo = settings_from_params(p)
    cfg = SolverConfig()

    t0 = time.time()
    res = run_pipeline(cfg, settings, cosmo, lin, mode=args.mode)
    res.table.block_until_ready()
    t1 = time.time()
    print(f"pipeline wall time {t1 - t0:.1f}s (incl. compile)")

    rows = []
    for line in open(f"{EX}/example_redTime_result.dat"):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    golden = np.array(rows).reshape(7, 128, 17)
    table = np.asarray(res.table)
    assert table.shape == golden.shape, (table.shape, golden.shape)

    names = ["k", "D", "f", "Pcb", "B/B1", "dlnB", "Pnu",
             "P_dd", "P_dt", "P_tt", "PB2", "PB4", "PB6",
             "PT2", "PT4", "PT6", "PT8"]
    print("pointwise relative error (blows up at PB/PT zero crossings —")
    print("the acceptance metric for those is scale-normalized, below):")
    print(f"{'col':>6} " + " ".join(f"{z:>9}" for z in [5, 4, 3, 2, 1, 0.5, 0]))
    for c in range(17):
        rel = []
        for iz in range(7):
            g = golden[iz, :, c]
            m = table[iz, :, c]
            rel.append(np.max(np.abs(m - g) / (np.abs(g) + 1e-30)))
        print(f"{names[c]:>6} " + " ".join(f"{r:9.2e}" for r in rel))

    print("\ncolumn-scale-normalized |diff| (acceptance metric):")
    worst_p, worst_rsd = 0.0, 0.0
    for c in range(7, 17):
        errs = []
        for iz in range(7):
            g = golden[iz, :, c]
            m = table[iz, :, c]
            errs.append(np.max(np.abs(m - g)) / np.max(np.abs(g)))
        print(f"{names[c]:>6} " + " ".join(f"{r:9.2e}" for r in errs))
        if c <= 9:
            worst_p = max(worst_p, max(errs))
        else:
            worst_rsd = max(worst_rsd, max(errs))
    print(f"\nP columns worst: {worst_p:.3e}  (target <= 1e-4)")
    print(f"RSD columns worst: {worst_rsd:.3e}  (reference self-error "
          f"band: 1e-4..7e-4)")


if __name__ == "__main__":
    main()
