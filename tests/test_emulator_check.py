"""Emulator-comparison harness tests: self-comparison identity, criteria,
and a live run against the framework's own output for the bundled example."""

import numpy as np
import pytest

from redtime_tpu.emulator_check import (assert_reference_criteria,
                                        compare_outputs,
                                        corrected_nonlinear_power)
from redtime_tpu.convert import read_redtime_table


def test_self_comparison_identity(example_dir):
    gold = f"{example_dir}/example_redTime_result.dat"
    res = compare_outputs(gold, gold, om_nu=0.00576437405571056,
                          om_m=0.286233679143621)
    assert res.max_abs == 0.0
    assert_reference_criteria(res, massive=True)


def test_correction_factor_structure(example_dir):
    t = read_redtime_table(f"{example_dir}/example_redTime_result.dat")
    k0, P0 = corrected_nonlinear_power(t)                  # no correction
    k1, P1 = corrected_nonlinear_power(t, om_nu=0.00576437405571056,
                                       om_m=0.286233679143621)
    f2 = P1 / P0
    # massive-nu: suppression factor below 1 at high k, approaching
    # (f_cb + f_nu)^2 ~ 1 at low k
    assert np.all(f2 <= 1.0 + 1e-12)
    assert f2[0] > f2[-1]
    assert f2[0] > 0.99


def test_framework_output_passes_reference_criteria(example_dir, tmp_path):
    """Run the real pipeline and hold our output to the reference CI's own
    massive-nu criterion against the bundled golden file."""
    import redtime_tpu as rt
    from redtime_tpu.io import read_params_file
    from redtime_tpu.io.camb import load_from_params
    from redtime_tpu.io.writer import write_result_to_path

    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    settings, cosmo = rt.settings_from_params(p)
    res = rt.run_pipeline(rt.SolverConfig(), settings, cosmo, lin,
                          mode="fft")
    out = tmp_path / "ours.dat"
    write_result_to_path(str(out), res)

    cmp_res = compare_outputs(
        str(out), f"{example_dir}/example_redTime_result.dat",
        om_nu=float(cosmo.Omega_nu), om_m=float(cosmo.Omega_m))
    assert_reference_criteria(cmp_res, massive=True)
    # far tighter than the CI bar in practice
    assert cmp_res.max_abs < 1e-4


def test_stored_targets_within_emulator_band():
    """Anchor the CosmicEmu recipe: the reference's own stored
    high-accuracy outputs sit within measured bands of the bundled
    Mira-Titan emulator predictions (test_models.py only *plots* this
    comparison; the bands asserted here were measured from those stored
    outputs: massless max 9.8e-4, massive max 9.3e-3 over the 40 low-k
    emulator points, k <= 0.0178/Mpc physical)."""
    import os

    from redtime_tpu.emulator_check import (emulator_rel_err,
                                            load_cosmicemu)

    base = "/root/reference/tests/emulator_comparison"
    if not os.path.isdir(f"{base}/emulator"):
        pytest.skip("reference emulator arrays unavailable")
    emu = load_cosmicemu(f"{base}/emulator")
    assert emu.logP.shape[0] == 351 and emu.logk.shape == (351,)

    for i in range(32):
        h = emu.params.T[i][3]
        om_nu, om_m = emu.params.T[i][7], emu.params.T[i][0]
        rf = np.loadtxt(
            f"{base}/output_kmax50_klogint1000/redTime_M{i+1:03d}.dat")
        k_code, P = rf[-128:, 0], rf[-128:, 7].copy()
        if i >= 10:   # massive-nu f^2 correction (test_models.py:29-40)
            trans_p = np.sqrt(rf[-128:, 6] / rf[-128:, 3])
            f = 1.0 - om_nu / om_m + trans_p * (om_nu / om_m)
            P = P * f * f
        rel = emulator_rel_err(k_code, P, h, emu, i)
        assert rel.max() < (1.2e-3 if i < 10 else 1.1e-2), (i + 1, rel.max())
