"""Emulator post-processing: the `convertPt` equivalent.

Extracts per-HACC-step k / P files from redTime-format output tables for
emulator construction (reference `src/convert_pt.c`): HACC step numbers map
to redshift-block indices, k is rescaled by h (1/Mpc units), P by 1/h^3
(Mpc^3), and P_dd gets the f_cb^2 total-matter correction (convert_pt.c:
54-56, 145-146, 158-160).

The legacy `convertPkFull` merger (src/convert_pk.c) is intentionally not
reproduced: it is a one-off with hardcoded absolute paths, documented in
SURVEY section 2 as document-but-don't-port.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

# HACC analysis step -> redshift-block index in a 33-z redTime output
# (reference convert_pt.c:145-146)
STEP_TO_ZBLOCK = {163: 9, 189: 11, 247: 14, 300: 18,
                  347: 24, 401: 28, 453: 31, 499: 32}


def read_models_file(path: str) -> List[Dict[str, float]]:
    """Design file: name om_m om_b s8 h ns w0 wa om_nu per line, 5 header
    lines skipped (reference convert_pt.c:80-91; little omegas = Om*h^2)."""
    models = []
    with open(path) as f:
        lines = f.readlines()[5:]
    for line in lines:
        parts = line.split()
        if len(parts) < 9:
            continue
        name, om, omb, s8, h, ns, w0, wa, omnu = parts[:9]
        models.append(dict(name=name, om_m=float(om), om_b=float(omb),
                           sigma_8=float(s8), h=float(h), n_s=float(ns),
                           w0=float(w0), wa=float(wa), om_nu=float(omnu)))
    return models


def read_redtime_table(path: str, nk: int = 128) -> np.ndarray:
    """Parse a redTime-format output file -> [n_z, nk, ncol]."""
    rows = []
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    arr = np.asarray(rows)
    if arr.shape[0] % nk != 0:
        raise ValueError(f"{path}: {arr.shape[0]} rows not divisible by "
                         f"nk={nk}")
    return arr.reshape(-1, nk, arr.shape[1])


def convert_pt_one(table: np.ndarray, h: float, f_cb: float,
                   step_no: int) -> Tuple[np.ndarray, np.ndarray]:
    """One model's (k, pk) arrays for a HACC step (reference
    process_PT_runs + main loop)."""
    iz = STEP_TO_ZBLOCK[step_no]
    k = table[0, :, 0] * h                      # k in 1/Mpc
    P = table[iz, :, 7] / h ** 3                # P_dd in Mpc^3
    return k, P * f_cb * f_cb


def convert_pt(n_models: int, step_no: int, nk_pt: int, params_file: str,
               red_dir: str, suffix: str = "no_interp_test") -> None:
    """CLI-equivalent batch conversion (reference convert_pt.c main):
    writes {red_dir}/STEP{step}/[k|pk]_M###_{suffix}.dat."""
    models = read_models_file(params_file)
    outdir = os.path.join(red_dir, f"STEP{step_no}")
    os.makedirs(outdir, exist_ok=True)
    for mn in range(1, n_models + 1):
        m = models[mn - 1]
        f_cb = (m["om_m"] - m["om_nu"]) / m["om_m"]
        table = read_redtime_table(
            os.path.join(red_dir, f"redTime_M{mn:03d}.dat"), nk_pt)
        k, pk = convert_pt_one(table, m["h"], f_cb, step_no)
        # reference writes "%lf " sequences on one line (convert_pt.c:53-58)
        with open(os.path.join(outdir,
                               f"k_M{mn:03d}_{suffix}.dat"), "w") as f:
            f.write("".join(f"{x:f} " for x in k))
        with open(os.path.join(outdir,
                               f"pk_M{mn:03d}_{suffix}.dat"), "w") as f:
            f.write("".join(f"{x:f} " for x in pk))
