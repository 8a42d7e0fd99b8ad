#!/usr/bin/env python
"""Production-pipeline demo, end to end, with no external dependencies:

  1. generate a small Latin-hypercube design (design.py);
  2. synthesize CAMB-format transfer stacks per model (analytic stand-in —
     in production these come from CAMB via scripts/run_redtime.py);
  3. emit params_redTime files with the 33-redshift output list;
  4. solve ALL models in one vmapped batch (cli batch);
  5. extract emulator (k, pk) files for one HACC step (convert).

Usage: python run_demo.py [--workdir DIR] [--n-models 4] [--platform cpu]
"""

import argparse
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    os.pardir, os.pardir)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import numpy as np


def synth_transfer_stack(workdir, z_list, seed):
    """Write a CAMB-7-column-format transfer stack with a smooth CDM-like
    shape and a plausible neutrino suppression (stand-in for CAMB)."""
    rng = np.random.default_rng(seed)
    k = np.logspace(-5, 1.3, 800)
    keq = 0.014 + 0.004 * rng.random()
    T = 1.0 / (1.0 + (k / keq) ** 2 * np.log(1.0 + k / keq))
    for z in z_list:
        a = 1.0 / (1.0 + float(z))
        supp = 1.0 / (1.0 + (k / 0.12) ** 2) * (0.3 + 0.7 * a) + 1e-4
        cols = np.column_stack([k, T, T, T, T, T * supp, T])
        path = os.path.join(workdir, f"camb_transfer_z{z}.dat")
        np.savetxt(path, cols, fmt="%.8e")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="./demo_out")
    ap.add_argument("--n-models", type=int, default=3)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)

    from redtime_tpu import design
    from run_redtime import CAMB_Z_LIST, write_params

    # 1. design file
    models_path = os.path.join(wd, "models.dat")
    design.generate_design(models_path, args.n_models, seed=1)
    from redtime_tpu.convert import read_models_file
    models = read_models_file(models_path)
    print(f"design: {len(models)} models")

    # 2+3. transfer stacks + params files (HACC convention: 8 analysis
    # steps map into the 33-z output list)
    z_list = CAMB_Z_LIST.split()
    params_paths = []
    for i, m in enumerate(models):
        name = f"M{i+1:03d}"
        # one stack per model: a shared directory would overwrite the
        # transfer files, silently feeding every model the LAST stack
        mdir = os.path.join(wd, name)
        os.makedirs(mdir, exist_ok=True)
        synth_transfer_stack(mdir, z_list, seed=100 + i)
        path = os.path.join(wd, f"params_redTime_{name}.dat")
        h = m["h"]
        write_params(path, name, m["om_m"], m["om_b"], m["sigma_8"], h,
                     m["n_s"], m["w0"], m["wa"], m["om_nu"], z_list,
                     transfer_root=f"{name}/camb_transfer_z")
        params_paths.append(path)

    # 4. one vmapped batch solve
    from redtime_tpu import cli
    rc = cli.main(["batch", "--output-dir", wd, "--platform",
                   args.platform, "--timing"] + params_paths)
    if rc != 0:
        return rc

    # 5. emulator extraction for HACC step 499 (z=0)
    from redtime_tpu.convert import convert_pt
    convert_pt(len(models), 499, 128, models_path, wd)
    sample = os.path.join(wd, "STEP499", "pk_M001_no_interp_test.dat")
    pk = np.fromstring(open(sample).read(), sep=" ")
    print(f"emulator extraction: {sample} ({len(pk)} values, "
          f"max {pk.max():.3e})")
    print("demo complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
