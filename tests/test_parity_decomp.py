"""Golden-deviation decomposition tests (round-4 VERDICT item 3).

The remaining golden-example deviation is pinned structurally rather than
hand-waved: every physics input is proven at 1e-8-or-better parity, the
output response to input perturbations is LINEAR (no controller
amplification), and what remains decomposes into

  (a) a single frozen evolved-P offset (~1.0e-5, flat in k and z),
      acquired in the first eta segment (z=200 -> 5) and frozen by the
      linear dynamics -- a loose-controller realization difference; the
      golden itself sits FARTHER from the converged trajectory than our
      solution does (measured 2.2e-5 vs 1.3e-5, same direction);
  (b) early-z transients in the I/Q-derived PB columns, each BELOW
      0.55x the golden's own distance-to-converged at that (column, z);
  (c) PT columns inheriting ~2x the P offset (they are recomputed from
      the evolved spectra at output times, reference redTime.cc:1646).

Measurements: scripts/probe_parity_decomp.py; narrative:
docs/PARITY_BAND.md (Round-4 decomposition).
"""

import dataclasses

import numpy as np
import pytest

from redtime_tpu import SolverConfig, run_pipeline, settings_from_params
from redtime_tpu import model as mdl
from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params

# 12-digit sigma_v^2 anchors printed in the golden file's stdout header
GOLDEN_SIGMA_V2 = {5.0: 1.49867805918, 4.0: 2.15727730749,
                   3.0: 3.36878152786, 2.0: 5.97746649976,
                   1.0: 13.2133220172, 0.5: 22.0988418658,
                   0.0: 37.9210668076}


@pytest.fixture(scope="module")
def setup(example_dir):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    settings, cosmo = settings_from_params(p)
    cfg = SolverConfig()
    rows = []
    for line in open(f"{example_dir}/example_redTime_result.dat"):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    golden = np.array(rows).reshape(7, 128, 17)
    return cfg, settings, cosmo, lin, golden


@pytest.fixture(scope="module")
def solves(setup):
    cfg, settings, cosmo, lin, golden = setup
    cfg_t = dataclasses.replace(cfg, eabs_P=1e-13, erel_P=1e-8)
    loose = np.asarray(run_pipeline(cfg, settings, cosmo, lin,
                                    mode="fft").table)
    tight = np.asarray(run_pipeline(cfg_t, settings, cosmo, lin,
                                    mode="fft").table)
    return loose, tight, golden


def _dev(a, b, c, iz):
    return (np.max(np.abs(a[iz, :, c] - b[iz, :, c]))
            / (np.max(np.abs(b[iz, :, c])) + 1e-300))


def test_beta_tabfun_oracle(setup):
    """beta_P must reproduce a line-faithful numpy replica of the
    reference's 2-D tabulated_function (AU_tabfun.h:262-328: cubic
    Lagrange interior / linear edges on both axes, findN semantics) on
    the raw beta table, across the full early-a stretch the output
    columns never validate."""
    from scripts.probe_parity_decomp import beta_oracle_factory
    from redtime_tpu.grids import make_grids

    cfg, settings, cosmo, lin, _ = setup
    model = mdl.prepare_model(cfg, cosmo, lin)
    g = make_grids(cfg)
    f2d = beta_oracle_factory(lin)
    f_nu = float(model.f_nu)
    kq = np.clip(np.asarray(g.k), 1e-3, 1.0)
    for a in (0.004975, 0.008, 0.02, 0.05, 0.1, 0.1666, 0.5, 1.0):
        ours = np.asarray(mdl.beta_P_solver(model, a))
        orc = f_nu * np.array([f2d(a, kk) for kk in kq])
        d = np.max(np.abs(ours - orc)) / (np.max(np.abs(orc)) + 1e-300)
        assert d < 1e-13, (a, d)


def test_sigma_v2_golden_header(setup):
    """sigma_v^2 parity against the 12-digit values the reference itself
    printed into the golden file (### main: output lines)."""
    cfg, settings, cosmo, lin, _ = setup
    model = mdl.prepare_model(cfg, cosmo, lin)
    for z, gv in GOLDEN_SIGMA_V2.items():
        ours = float(mdl.sigma_v2(model, z))
        bar = 1e-10 if z == 0.0 else 5e-8  # z=0 is the qag-normalized
        # anchor; z>0 carries the growth-table interpolation parity
        assert abs(ours - gv) / gv < bar, (z, ours, gv)


def test_closer_to_converged_than_golden(solves):
    """Our loose solution must sit CLOSER to the converged (tight)
    trajectory than the golden does, for every evolved-P column and z —
    the quantitative form of 'the deviation is the reference's own
    loose-controller realization, not our physics'."""
    loose, tight, golden = solves
    for c in (7, 8, 9):
        for iz in range(7):
            ours = _dev(loose, tight, c, iz)
            refs = _dev(golden, tight, c, iz)
            assert ours < refs, (c, iz, ours, refs)


def test_frozen_offset_structure(solves):
    """The evolved-P deviation is a flat multiplicative offset: mean
    |ratio-1| ~1e-5 with k/z-variation well below the offset except the
    z=5 high-k transient (measured mean 1.04e-5, std 4.8e-6)."""
    loose, tight, golden = solves
    r = loose[:, :, 7:10] / golden[:, :, 7:10] - 1.0
    assert abs(np.mean(r)) < 2.5e-5
    assert np.std(r) < 1.2e-5
    # z<=3 blocks: transient gone, pure offset
    assert np.std(r[2:]) < 6e-6


def test_pb_transients_below_reference_distance(solves):
    """Early-z PB (A/I-derived) column deviations sit below 0.55x the
    golden's own distance from the converged trajectory at every
    (column, z) (measured worst ratio 0.40)."""
    loose, tight, golden = solves
    for c in (10, 11, 12):
        for iz in range(7):
            dev = _dev(loose, golden, c, iz)
            ref = _dev(golden, tight, c, iz)
            assert dev < 0.55 * ref, (c, iz, dev, ref, dev / ref)


def test_pt_columns_inherit_p_offset(solves):
    """PT (B-term) columns are recomputed from the evolved spectra at
    output times, so their deviation is bounded by ~2x the measured
    frozen P offset plus transient headroom (measured 1.2-2.4e-5
    against offset 1.04e-5)."""
    loose, tight, golden = solves
    offset = abs(np.mean(loose[:, :, 7:10] / golden[:, :, 7:10] - 1.0))
    for c in (13, 14, 15, 16):
        for iz in range(7):
            dev = _dev(loose, golden, c, iz)
            assert dev < 2.5 * offset + 1.5e-5, (c, iz, dev, offset)
