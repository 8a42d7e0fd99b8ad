"""CAMB-in-the-loop orchestration tests with a mock CAMB binary.

Drives scripts/run_redtime.py (the `runRedTime` equivalent, reference
`scripts/runRedTime:98-226`) end-to-end through BOTH CAMB passes using
tests/mock_camb.py, covering: the little-omega -> Omega derivations and
the N_eff massless/massive split, ini templating, the sigma8 stdout
parse, the two-pass A_s rescale A_s*(sigma8_target/sigma8)^2, the
params_redTime.dat emission (switches "1 0 1 1", 33 interp z's), and
that the solver output written by the pipeline matches a direct
run_pipeline call on the same inputs.
"""

import argparse
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
MOCK_CAMB = os.path.join(HERE, "mock_camb.py")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import run_redtime  # noqa: E402

BASE_AMP = 2.15903458773893e-9
MOCK_BASE_SIGMA8 = 0.8


def _read_amps(outdir):
    path = os.path.join(outdir, "mock_camb_amps.log")
    return [float(x) for x in open(path).read().split()]


def test_two_pass_sigma8_rescale_and_solve(tmp_path):
    """Massless-nu model through the full pipeline: two CAMB passes,
    A_s rescale arithmetic, params emission, and solver-output parity
    with a direct run_pipeline call."""
    outdir = str(tmp_path / "out")
    rf = tmp_path / "redshifts.txt"
    rf.write_text("1.0 0.0\n")

    s8_target = 0.84
    model = ("TESTM", 0.1335, 0.02258, s8_target, 0.71, 0.963,
             -1.0, 0.0, 0.0)
    rc = run_redtime.main([
        "--redshift-file", str(rf), "--output-dir", outdir,
        "--camb-exec", MOCK_CAMB, "--mode", "fft",
    ] + [str(x) for x in model])
    assert rc == 0

    # --- the two-pass A_s rescale (runRedTime:161-186) ---
    amps = _read_amps(outdir)
    assert len(amps) == 2, "CAMB must run exactly twice"
    assert amps[0] == pytest.approx(BASE_AMP, rel=1e-14)
    sigma8_pass1 = MOCK_BASE_SIGMA8 * np.sqrt(amps[0] / BASE_AMP)
    expect_amp2 = BASE_AMP * (s8_target / sigma8_pass1) ** 2
    assert amps[1] == pytest.approx(expect_amp2, rel=1e-12)
    # with the rescaled amplitude the mock's sigma8 hits the target
    sigma8_pass2 = MOCK_BASE_SIGMA8 * np.sqrt(amps[1] / BASE_AMP)
    assert sigma8_pass2 == pytest.approx(s8_target, rel=1e-12)

    # --- transfer files materialized where the params file points ---
    assert os.path.exists(os.path.join(outdir, "camb_transfer_z0.dat"))
    assert os.path.exists(os.path.join(
        outdir, "camb_transfer_z2.0180180180180183.dat"))

    # --- params_redTime.dat emission (runRedTime:198-219) ---
    from redtime_tpu.io import read_params_file

    params_path = os.path.join(outdir, "params_redTime_TESTM.dat")
    p = read_params_file(params_path)
    assert (p.switch_nonlinear, p.switch_1loop, p.print_lin,
            p.print_rsd) == (1, 0, 1, 1)
    assert p.z_in == 200.0
    assert p.z_out == [1.0, 0.0]
    assert p.n_s == 0.963 and p.sigma_8 == s8_target and p.h == 0.71
    assert p.Omega_m == pytest.approx(0.1335 / 0.71 ** 2, rel=1e-14)
    assert p.Omega_b == pytest.approx(0.02258 / 0.71 ** 2, rel=1e-14)
    assert p.Omega_nu == 0.0
    assert p.transfer_file == "camb_transfer_z0.dat"
    assert len(p.z_interp_str) == 33
    assert p.z_interp_str[0] == "200" and p.z_interp_str[-1] == "0"

    # --- solver output == direct run_pipeline on the same inputs ---
    out_path = os.path.join(outdir, "redTime_TESTM.dat")
    assert os.path.exists(out_path)
    table_file = np.loadtxt(out_path)
    assert table_file.shape == (2 * 128, 17)

    from redtime_tpu.cli import _load
    from redtime_tpu.config import SolverConfig
    from redtime_tpu.driver import run_pipeline

    _, lin, settings, cosmo = _load(params_path, modern=False)
    res = run_pipeline(SolverConfig(fft_mode="fft"), settings, cosmo, lin,
                       mode="fft")
    direct = np.asarray(res.table).reshape(-1, 17)
    # file round-trips through %.12g formatting
    scale = np.max(np.abs(direct), axis=0, keepdims=True)
    assert np.max(np.abs(table_file - direct) / (scale + 1e-300)) < 1e-10
    # full-TRG mode contract: B-term columns print as 0 (SURVEY caveat)
    assert np.all(table_file[:, 13:17] == 0.0)


def test_massive_nu_ini_and_params_emission(tmp_path):
    """Massive-nu model: N_eff split in the generated ini, params
    emission, and that the mock transfer stack is readable as a full
    33-node beta_P input."""
    outdir = str(tmp_path / "out")
    z_out = ["0.0"]
    model = ("TESTNU", 0.1335, 0.02258, 0.85, 0.71, 0.963, -0.9, 0.1,
             0.001)
    args = argparse.Namespace(
        output_dir=outdir, camb_exec=MOCK_CAMB, template_dir=None,
        modern_camb=False)
    params_path = run_redtime.run_model(args, model, z_out)

    ini = open(os.path.join(outdir, "temp_camb.ini")).read()
    assert "massless_neutrinos = 0" in ini
    assert "massive_neutrinos  = 3.046" in ini
    assert "omnuh2       = 1.000000e-03" in ini
    assert "hubble       = 7.100000e+01" in ini
    # CPL dark energy propagated
    assert "w  = -9.000000e-01" in ini
    assert "wa = 1.000000e-01" in ini
    # second pass wrote the rescaled amplitude into the ini
    amps = _read_amps(outdir)
    assert len(amps) == 2
    import re
    m = re.search(r"scalar_amp\(1\)\s*=\s*(\S+)", ini)
    assert float(m.group(1)) == pytest.approx(amps[1], rel=1e-14)

    from redtime_tpu.io import read_params_file
    from redtime_tpu.io.camb import load_from_params

    p = read_params_file(params_path)
    assert p.Omega_nu == pytest.approx(0.001 / 0.71 ** 2, rel=1e-14)
    lin = load_from_params(p, outdir, modern=False)
    assert lin.beta_raw.shape == (33, 400)
    assert np.all(np.isfinite(lin.beta_raw))
    # stack ordering: greatest redshift first -> ascending scale factor
    assert np.all(np.diff(lin.beta_a) > 0)


def test_massless_split_in_ini(tmp_path):
    """om_nu < 1e-10 selects the massless N_eff branch
    (runRedTime:115-119)."""
    outdir = str(tmp_path / "out")
    args = argparse.Namespace(
        output_dir=outdir, camb_exec=MOCK_CAMB, template_dir=None,
        modern_camb=False)
    run_redtime.run_model(
        args, ("TESTL", 0.1335, 0.02258, 0.8, 0.71, 0.963, -1.0, 0.0,
               0.0), ["0.0"])
    ini = open(os.path.join(outdir, "temp_camb.ini")).read()
    assert "massless_neutrinos = 3.046" in ini
    assert "massive_neutrinos  = 0" in ini
