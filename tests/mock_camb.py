#!/usr/bin/env python3
"""Mock CAMB binary for orchestration tests.

Stands in for the modified-CAMB Fortran executable in the runRedTime
pipeline (reference `scripts/runRedTime:154-186`): reads the generated
.ini, writes one synthetic 7-column transfer file per requested redshift
under `{output_root}_{transfer_filename(i)}`, and prints a CAMB-style
sigma8 line as the LAST stdout line (the orchestration parses it with
the reference's `tail -1 | tr '=' '\\n' | tail -1` rule).

The reported sigma8 scales as sqrt(scalar_amp) around the pipeline's
base amplitude, so the two-pass A_s rescale
(A_s *= (sigma8_target/sigma8)^2, runRedTime:161-186) converges exactly
on the second pass — making the rescale arithmetic observable.  The
transfer SHAPES are amplitude-independent, as in real CAMB.

Every invocation appends the scalar_amp it saw to
`<outdir>/mock_camb_amps.log` so tests can assert the pass sequence.
"""

import os
import sys

import numpy as np

BASE_AMP = 2.15903458773893e-9
BASE_SIGMA8 = 0.8


def parse_ini(path):
    kv = {}
    for line in open(path):
        line = line.split("#")[0].strip()
        if "=" in line:
            key, val = line.split("=", 1)
            kv[key.strip()] = val.strip()
    return kv


def transfer_table(z, omch2):
    """Synthetic but physically-shaped 7-column transfer table."""
    k = np.logspace(-5, 1.3, 400)
    keq = 0.015 * (omch2 / 0.112)
    Tc = 1.0 / (1.0 + (k / keq) ** 2 * np.log(1.0 + k / keq))
    Tb = 0.97 * Tc * (1.0 + 0.02 * np.cos(np.log(k) / 3.0))
    a = 1.0 / (1.0 + z)
    Tnu = Tc / (1.0 + (k / 0.1) ** 2) * (0.3 + 0.7 * a)
    # cols: k, CDM, baryon, photon, massless nu, massive nu, total
    return np.column_stack([k, Tc, Tb, Tc, Tc, Tnu, Tc])


def main():
    ini = sys.argv[1]
    kv = parse_ini(ini)
    root = kv["output_root"]
    amp = float(kv["scalar_amp(1)"])
    omch2 = float(kv["omch2"])
    n_z = int(kv["transfer_num_redshifts"])

    outdir = os.path.dirname(os.path.abspath(root))
    with open(os.path.join(outdir, "mock_camb_amps.log"), "a") as f:
        f.write(repr(amp) + "\n")

    for i in range(1, n_z + 1):
        z = float(kv[f"transfer_redshift({i})"])
        fname = kv[f"transfer_filename({i})"]
        np.savetxt(f"{root}_{fname}", transfer_table(z, omch2),
                   fmt="%.10e")

    sigma8 = BASE_SIGMA8 * np.sqrt(amp / BASE_AMP)
    print("mock CAMB: wrote", n_z, "transfer files under", root)
    print("Age of universe/GYr = 13.75")
    print(f" at z =  0.000 sigma8 (all matter) = {float(sigma8)!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
