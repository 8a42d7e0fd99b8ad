#!/usr/bin/env python
"""Probe: decompose the golden-example deviation (round-4 VERDICT item 3).

Measurements (all on the bundled reference example, CPU f64, mode=fft):

1. three-way comparison: our loose solve (production tolerances, the
   settings the golden was made with), our tight solve (eabs 1e-13,
   erel 1e-8 -- converged), and the golden file itself, per column/z;
2. perturbation linearity: a k-dependent 1e-9..1e-6 shape perturbation
   of the input transfer function produces a LINEAR output response
   (no controller accept/reject amplification) -- the step sequence is
   robust to input-parity-scale differences;
3. input-parity anchors: beta_P vs a line-faithful numpy oracle of the
   reference's 2-D tabulated_function (AU_tabfun.h:262-328), and
   sigma_v^2 vs the 12-digit values printed in the golden header.

Findings recorded in docs/PARITY_BAND.md ("Round-4 decomposition").
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from redtime_tpu import SolverConfig, run_pipeline, settings_from_params  # noqa: E402
from redtime_tpu import model as mdl  # noqa: E402
from redtime_tpu.io import read_params_file  # noqa: E402
from redtime_tpu.io.camb import load_from_params  # noqa: E402

EXAMPLE = "/root/reference/examples/1_redTime"

# 12-digit sigma_v^2 values from the golden file's own stdout header
# (### main: output lines, example_redTime_result.dat)
GOLDEN_SIGMA_V2 = {5.0: 1.49867805918, 4.0: 2.15727730749,
                   3.0: 3.36878152786, 2.0: 5.97746649976,
                   1.0: 13.2133220172, 0.5: 22.0988418658,
                   0.0: 37.9210668076}


def load_golden():
    rows = []
    for line in open(f"{EXAMPLE}/example_redTime_result.dat"):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    return np.array(rows).reshape(7, 128, 17)


def beta_oracle_factory(lin):
    """Line-faithful numpy replica of tabulated_function::f(x, y)
    (reference AU_tabfun.h:262-328) on the raw beta table: x-axis = a
    (cubic Lagrange interior / linear edge), y-axis = k (same rules),
    findN semantics `while (xTable[n+1] < x && n < size-2) n++`."""
    aT = np.asarray(lin.beta_a)
    kT = np.asarray(lin.beta_k)
    F = np.asarray(lin.beta_raw)

    def lin_i(xT, fT, x):
        return fT[0] + (fT[1] - fT[0]) / (xT[1] - xT[0]) * (x - xT[0])

    def cub_i(xT, fT, x):
        tot = 0.0
        for i in range(4):
            t = fT[i]
            for j in range(4):
                if j != i:
                    t = t * (x - xT[j]) / (xT[i] - xT[j])
            tot += t
        return tot

    def find_n(xT, x, size):
        n = 0
        while xT[n + 1] < x and n < size - 2:
            n += 1
        return n

    def f2d(a, k):
        nX, nY = len(aT), len(kT)
        nx, ny = find_n(aT, a, nX), find_n(kT, k, nY)
        if 0 < nx < nX - 2:
            fy = [cub_i(aT[nx - 1:nx + 3], F[nx - 1:nx + 3, ny - 1 + m], a)
                  for m in range(4)]
        else:
            fy = [lin_i(aT[nx:nx + 2], F[nx:nx + 2, ny - 1 + m], a)
                  for m in range(4)]
        if 0 < ny < nY - 2:
            return cub_i(kT[ny - 1:ny + 3], fy, k)
        return lin_i(kT[ny:ny + 2], fy[1:3], k)

    return f2d


def main():
    from redtime_tpu.grids import make_grids

    p = read_params_file(f"{EXAMPLE}/params_redTime.dat")
    lin = load_from_params(p, EXAMPLE)
    settings, cosmo = settings_from_params(p)
    cfg = SolverConfig()
    cfg_t = dataclasses.replace(cfg, eabs_P=1e-13, erel_P=1e-8)
    golden = load_golden()

    t_loose = np.asarray(run_pipeline(cfg, settings, cosmo, lin,
                                      mode="fft").table)
    t_tight = np.asarray(run_pipeline(cfg_t, settings, cosmo, lin,
                                      mode="fft").table)

    def dv(a, b, c, iz):
        return (np.max(np.abs(a[iz, :, c] - b[iz, :, c]))
                / (np.max(np.abs(b[iz, :, c])) + 1e-300))

    print("== three-way per column (rows: our-band, golden-vs-tight, dev) ==")
    for c in range(7, 17):
        band = [dv(t_loose, t_tight, c, iz) for iz in range(7)]
        refd = [dv(golden, t_tight, c, iz) for iz in range(7)]
        devs = [dv(t_loose, golden, c, iz) for iz in range(7)]
        print(f"c{c:2d} band: " + " ".join(f"{x:.1e}" for x in band))
        print("    ref : " + " ".join(f"{x:.1e}" for x in refd))
        print("    dev : " + " ".join(f"{x:.1e}" for x in devs))

    print("== frozen evolved-P offset (cols 7-9, ratio to golden) ==")
    r = t_loose[:, :, 7:10] / golden[:, :, 7:10] - 1.0
    print(f"mean {np.mean(r):.3e}  std {np.std(r):.3e}  "
          f"max|.| {np.max(np.abs(r)):.3e}")

    print("== perturbation linearity (shape eps -> output dev) ==")
    shape = np.sin(np.asarray(lin.t_lnk))
    for eps in (1e-9, 1e-7, 1e-6):
        f = 1.0 + eps * shape / 2
        lin2 = lin._replace(t_Tc=lin.t_Tc * f, t_Tb=lin.t_Tb * f)
        t1 = np.asarray(run_pipeline(cfg, settings, cosmo, lin2,
                                     mode="fft").table)
        w = max(dv(t1, t_loose, c, iz)
                for c in range(7, 17) for iz in range(7))
        print(f"eps={eps:.0e}: worst col-scale response {w:.2e} "
              f"(ratio {w / eps:.2f})")

    print("== beta_P vs the AU_tabfun oracle ==")
    model = mdl.prepare_model(cfg, cosmo, lin)
    g = make_grids(cfg)
    f2d = beta_oracle_factory(lin)
    f_nu = float(model.f_nu)
    kq = np.clip(np.asarray(g.k), 1e-3, 1.0)
    for a in (0.004975, 0.02, 0.1, 0.5, 1.0):
        ours = np.asarray(mdl.beta_P_solver(model, a))
        orc = f_nu * np.array([f2d(a, kk) for kk in kq])
        d = np.max(np.abs(ours - orc)) / (np.max(np.abs(orc)) + 1e-300)
        print(f"a={a:.6f}: {d:.2e}")

    print("== sigma_v^2 vs the golden header (12 digits) ==")
    for z, gv in sorted(GOLDEN_SIGMA_V2.items()):
        ours = float(mdl.sigma_v2(model, z))
        print(f"z={z}: rel {(ours - gv) / gv:.2e}")


if __name__ == "__main__":
    main()
