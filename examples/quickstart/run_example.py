#!/usr/bin/env python
"""Quickstart: solve the reference's bundled example cosmology end-to-end.

A massive-neutrino w0waCDM model, 1-loop Time-RG + TNS RSD corrections,
7 output redshifts — identical inputs to the reference's
examples/1_redTime/run.sh, producing the same 17-column table.

Usage:  python run_example.py [--example-dir PATH] [-o results.dat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

import redtime_tpu as rt
from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params
from redtime_tpu.io.writer import write_result_to_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example-dir",
                    default="/root/reference/examples/1_redTime")
    ap.add_argument("-o", "--output", default="results.dat")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "fft", "matmul"])
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the CPU backend")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    params = read_params_file(f"{args.example_dir}/params_redTime.dat")
    linear = load_from_params(params, args.example_dir)
    settings, cosmo = rt.settings_from_params(params)

    cfg = rt.SolverConfig()          # reference defaults: nk=128, np=4nk
    t0 = time.time()
    res = rt.run_pipeline(cfg, settings, cosmo, linear, mode=args.mode)
    res.table.block_until_ready()
    print(f"solved in {time.time() - t0:.1f}s "
          "(first call includes compilation)")

    write_result_to_path(args.output, res, "params_redTime.dat")
    print(f"wrote {args.output}: {res.table.shape[0]} redshift blocks x "
          f"{res.table.shape[1]} k x {res.table.shape[2]} columns")

    # the arrays are also directly available:
    print(f"sigma_v^2(z=0) = {float(res.sigmaV2_z0):.6f}")
    print(f"P_dd(z=0, k={float(res.k[64]):.4f}) = "
          f"{float(res.table[-1, 64, 7]):.4f}")


if __name__ == "__main__":
    main()
