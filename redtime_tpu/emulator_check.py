"""Emulator-comparison harness: the reference CI's accuracy criteria.

Ports the comparison logic of `tests/emulator_comparison/test_models.py` so
a CAMB-equipped environment can run the full 32-model validation against
stored high-accuracy outputs or Mira-Titan emulator arrays.  No CAMB
dependency here — it compares any two redTime-format outputs.

Recipes (reference test_models.py):
  * dimensionless spectrum: Delta^2-like = P/h^3/(2 pi^2) * k^1.5
    (:22-26); pure ratios on a shared k grid cancel these factors;
  * massive-nu total-matter correction (:29-40):
      trans_p = sqrt(P_lin_nu / P_lin_cb)        (cols 6, 3)
      beta_p  = trans_p * (om_nu / om_m)
      f       = 1 - om_nu/om_m + beta_p
      P_mm    = P_dd * f^2                        (col 7)
  * criteria: massless max|ratio-1| < 1e-3 for k < 0.1 (:86-89);
    massive max < 5e-3 and 95th pct < 1e-3 (:156-159).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from redtime_tpu.convert import read_redtime_table


class ComparisonResult(NamedTuple):
    k: np.ndarray              # selected k (code units)
    ratio: np.ndarray          # P/P_target - 1
    max_abs: float
    q95: float


def corrected_nonlinear_power(table: np.ndarray, om_nu: float = 0.0,
                              om_m: float = 1.0, iz: int = -1):
    """(k, P) of the z-block `iz`, with the massive-nu total-matter
    correction applied when om_nu > 0 (reference get_neutrino_nlin)."""
    blk = table[iz]
    k, P = blk[:, 0], blk[:, 7].copy()
    if om_nu > 0:
        trans_p = np.sqrt(blk[:, 6] / blk[:, 3])
        beta_p = trans_p * (om_nu / om_m)
        f = 1.0 - om_nu / om_m + beta_p
        P = P * f * f
    return k, P


def compare_outputs(ours: str, target: str, nk: int = 128,
                    k_max: float = 0.1, om_nu: float = 0.0,
                    om_m: float = 1.0) -> ComparisonResult:
    """z=0 P_dd comparison between two redTime-format outputs (identical
    k grids required, as the reference test asserts)."""
    ka, Pa = corrected_nonlinear_power(read_redtime_table(ours, nk),
                                       om_nu, om_m)
    kb, Pb = corrected_nonlinear_power(read_redtime_table(target, nk),
                                       om_nu, om_m)
    if not np.allclose(ka, kb, rtol=1e-12):
        raise ValueError("k grids differ between outputs")
    sel = ka < k_max
    ratio = Pa[sel] / Pb[sel] - 1.0
    return ComparisonResult(ka[sel], ratio, float(np.max(np.abs(ratio))),
                            float(np.quantile(np.abs(ratio), 0.95)))


def assert_reference_criteria(res: ComparisonResult,
                              massive: bool = False) -> None:
    """The reference CI thresholds (test_models.py:86-89, 156-159).

    Raises AssertionError explicitly — bare `assert` statements are
    stripped under `python -O`, silently disabling the validation."""
    if massive:
        if not res.max_abs < 5e-3:
            raise AssertionError(
                f"massive-nu max |dP/P| = {res.max_abs} >= 5e-3")
        if not res.q95 < 1e-3:
            raise AssertionError(
                f"massive-nu q95 |dP/P| = {res.q95} >= 1e-3")
    elif not res.max_abs < 1e-3:
        raise AssertionError(
            f"massless-nu max |dP/P| = {res.max_abs} >= 1e-3")
