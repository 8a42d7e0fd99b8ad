#!/usr/bin/env python
"""Generate the converged self-golden artifact (round-4 VERDICT item 6).

Runs the bundled reference example (examples/1_redTime: massive-nu
w0waCDM, 1-loop mode, 7 output redshifts) at TIGHT tolerances
(eabs 1e-13, erel 1e-8 — ~1000x below the reference's own loose
(1e-7, 1e-2) run that produced example_redTime_result.dat) on the CPU
f64 backend and freezes the full 17-column table plus the header
scalars into tests/data/selfgolden_tight.npz.

The artifact pins the CONVERGED trajectory, which the reference's
bundled golden only brackets at its loose-controller band (~2e-5 on the
spectra; docs/PARITY_BAND.md): tests/test_selfgolden.py re-solves at
the same tight tolerances and asserts ~1e-7-scale agreement, catching
engine/controller regressions 1000x below the reference-band bars of
test_golden_e2e.py.

Usage: python scripts/gen_selfgolden.py [--example DIR] [--out PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from redtime_tpu import SolverConfig, run_pipeline, settings_from_params  # noqa: E402
from redtime_tpu.io import read_params_file  # noqa: E402
from redtime_tpu.io.camb import load_from_params  # noqa: E402

TIGHT = dict(eabs_P=1e-13, erel_P=1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example",
                    default="/root/reference/examples/1_redTime")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "tests", "data", "selfgolden_tight.npz"))
    args = ap.parse_args()

    p = read_params_file(os.path.join(args.example, "params_redTime.dat"))
    lin = load_from_params(p, args.example)
    settings, cosmo = settings_from_params(p)
    cfg = dataclasses.replace(SolverConfig(), **TIGHT)

    res = run_pipeline(cfg, settings, cosmo, lin, mode="fft")
    table = np.asarray(res.table)
    assert table.shape == (7, 128, 17) and np.all(np.isfinite(table))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(
        args.out, table=table,
        k=np.asarray(res.k), z=np.asarray(res.z),
        sigma_v2=np.asarray(res.sigma_v2),
        sigmaV2_z0=np.asarray(res.sigmaV2_z0),
        eabs_P=TIGHT["eabs_P"], erel_P=TIGHT["erel_P"])
    print(f"wrote {args.out}: table {table.shape}, "
          f"tolerances ({TIGHT['eabs_P']}, {TIGHT['erel_P']})")


if __name__ == "__main__":
    main()
