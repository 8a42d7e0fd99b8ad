#!/usr/bin/env python
"""v0.1-compat self-anchor (VERDICT r2 #9): no v0.1 output artifact exists
in the reference repo, so bound `SolverConfig.v01_compat()` by
cross-validating it against the production default on the bundled
massive-nu example — same physics, different discretization (nk 256 vs
128, np 8nk vs 4nk, wide beta range, 1000-node growth k-table,
a_early=1e-50, per-segment h reset).  The overlap band documents how far
a v0.1-configured run can drift from the production configuration.

Compares z=0 P_dd (and P_lin) on the shared k range by log-log
interpolation of the v01 grid onto the default grid.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
cpu = jax.devices("cpu")[0]
jax.config.update("jax_default_device", cpu)

import numpy as np

from redtime_tpu import driver
from redtime_tpu.config import RunSettings, SolverConfig
from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params

EXAMPLE = "/root/reference/examples/1_redTime"


def main():
    p = read_params_file(f"{EXAMPLE}/params_redTime.dat")
    lin = load_from_params(p, base_dir=EXAMPLE)
    settings, cosmo = driver.settings_from_params(p)
    settings = RunSettings(nonlinear=settings.nonlinear,
                           one_loop=settings.one_loop,
                           print_lin=True, print_rsd=settings.print_rsd,
                           z_in=settings.z_in, z_out=(1.0, 0.0))

    out = {}
    for name, cfg in (("default", SolverConfig()),
                      ("v01", SolverConfig.v01_compat())):
        t0 = time.time()
        res = driver.run_pipeline(cfg, settings, cosmo, lin)
        tab = np.asarray(res.table)
        print(f"{name}: nk={cfg.nk} np={cfg.npts} solved in "
              f"{time.time()-t0:.1f} s, table {tab.shape}")
        out[name] = tab

    kd = out["default"][-1, :, 0]
    kv = out["v01"][-1, :, 0]
    lo, hi = max(kd.min(), kv.min()), min(kd.max(), kv.max())
    sel = (kd >= lo) & (kd <= hi)
    for col, label in ((3, "P_lin_cb"), (7, "P_dd"), (1, "P_cb 1-loop?" )):
        Pd = out["default"][-1, sel, col]
        Pv = 10 ** np.interp(np.log10(kd[sel]), np.log10(kv),
                             np.log10(np.abs(out["v01"][-1, :, col]) + 1e-300))
        rel = np.abs(Pv / Pd - 1.0)
        kmask = kd[sel] < 0.1 / 0.7   # ~ k_phys < 0.1
        print(f"z=0 col {col} ({label}): max|dP/P| full-range "
              f"{rel.max():.3e}, low-k {rel[kmask].max():.3e}")


if __name__ == "__main__":
    main()
