"""Configuration-space smoke tests: non-default grids, extended output
columns, high-accuracy-style settings (BASELINE configs 3-4)."""

import numpy as np
import pytest

import jax

from redtime_tpu import SolverConfig, RunSettings, CosmoParams
from redtime_tpu import driver, model as mdl
from redtime_tpu.grids import make_grids


def _toy_inputs(nu=True):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _example_inputs, _cosmo
    return _cosmo(), _example_inputs(SolverConfig(), nu)


SMALL = dict(growth_n_lna=16, growth_n_lnk=8, quad_panels=16, quad_order=8)


def _run(cfg, settings):
    cosmo, lin = _toy_inputs()
    res = driver.run_pipeline(cfg, settings, cosmo, lin, mode="fft")
    table = np.asarray(res.table)
    assert np.all(np.isfinite(table))
    assert table.shape == (len(settings.z_out), cfg.nk,
                           driver.n_columns(cfg, settings))
    return table


def test_np_factor_8_grid_geometry():
    """np = 8 nk activates the right-side taper the compiled reference
    never reaches (redTime.cc:102 comment 'use for np = 8*nk')."""
    cfg = SolverConfig(nk=64, np_factor=8, **SMALL)
    g = make_grids(cfg)
    assert g.npts == 512
    # right taper now on-grid
    assert g.wp[-1] == 0.0
    assert np.any((g.wp > 0) & (g.wp < 1))
    _run(cfg, RunSettings(z_out=(1.0, 0.0)))


def test_extended_output_columns():
    cfg = SolverConfig(nk=32, print_a=True, print_i=True, print_q=True,
                       print_bias=True, **SMALL)
    settings = RunSettings(z_out=(0.0,))
    table = _run(cfg, settings)
    # 1 + 6 + 3 + 14 + 14 + (5+9+8) + 24
    assert table.shape[-1] == 1 + 6 + 3 + 14 + 14 + 22 + 24


def test_print_q_without_rsd():
    cfg = SolverConfig(nk=32, print_q=True, **SMALL)
    settings = RunSettings(print_rsd=False, z_out=(0.0,))
    table = _run(cfg, settings)
    # Q columns evolved (nonzero) even though RSD columns are absent
    assert table.shape[-1] == 1 + 6 + 3 + 24
    assert np.any(table[:, :, 10:] != 0)


def test_high_accuracy_style():
    """HIGH_ACCURACY-flavored settings (reference ifdef: nk=512; here a
    scaled-down variant exercising tight tolerances + wide beta clamp +
    deeper a_early)."""
    cfg = SolverConfig(nk=64, eabs_P=1e-12, erel_P=1e-5,
                       beta_k_min=1e-5, beta_k_max=20.0, a_early=1e-30,
                       **SMALL)
    t_def = _run(SolverConfig(nk=64, **SMALL), RunSettings(z_out=(0.0,)))
    t_ha = _run(cfg, RunSettings(z_out=(0.0,)))
    # same physics, close but not identical (different tolerances)
    rel = np.abs(t_ha[:, :, 7] / t_def[:, :, 7] - 1)
    assert np.max(rel) < 5e-2
    assert np.max(rel) > 0


def test_linear_only_mode():
    cfg = SolverConfig(nk=32, **SMALL)
    settings = RunSettings(nonlinear=False, z_out=(1.0, 0.0))
    table = _run(cfg, settings)
    # no RSD signal in linear mode
    assert np.all(table[:, :, 10:] == 0)


def test_high_accuracy_preset_runs():
    """nk=512 (the HIGH_ACCURACY ifdef grid) end to end on a short z list."""
    cfg = SolverConfig.high_accuracy(**SMALL)
    assert cfg.nk == 512 and cfg.npts == 2048
    table = _run(cfg, RunSettings(z_out=(0.0,)))
    assert table.shape[1] == 512


def test_v01_compat_preset_runs():
    """v0.1-compat preset (reference README.md:123-155) end to end:
    nk=256, np=8nk, wide beta_P k-range, a_early=1e-50 ramp — the
    configuration that exposed the growth-scale subnormal fault on TPU
    (see test_v01_growth_table_stays_above_f32_normal_floor)."""
    cfg = SolverConfig.v01_compat(**SMALL)
    assert cfg.nk == 256 and cfg.npts == 2048
    assert cfg.a_early == 1e-50 and cfg.beta_k_max == 20.0
    table = _run(cfg, RunSettings(z_out=(0.0,)))
    assert table.shape[1] == 256


def test_eta_tableau_converges_to_rkf45():
    """The eta_tableau knob's contract (config.py eta_tableau docstring):
    'dopri5' and 'dop853' land on the SAME converged trajectory as the
    reference's rkf45 (redTime.cc:1593) once erel is tight.  Full-TRG
    mode (the engine runs inside the RHS) at erel=1e-8: the three
    embedded pairs take different step sequences but must agree on the
    output table far below the reference parity band."""
    import dataclasses

    cfg0 = SolverConfig(nk=32, eabs_P=1e-13, erel_P=1e-8, **SMALL)
    s = RunSettings(one_loop=False, z_out=(1.0, 0.0))
    t_ref = _run(cfg0, s)
    for tab in ("dopri5", "dop853"):
        t = _run(dataclasses.replace(cfg0, eta_tableau=tab), s)
        # spectra pointwise
        for c in (7, 8, 9):
            rel = np.abs(t[:, :, c] / t_ref[:, :, c] - 1)
            assert np.max(rel) < 5e-7, (tab, c, np.max(rel))
        # RSD columns (zero-crossing) at column scale; full-TRG leaves
        # the PT columns 13-16 at zero in both (the reference caveat)
        for c in (10, 11, 12):
            scale = np.max(np.abs(t_ref[:, :, c]))
            dev = np.max(np.abs(t[:, :, c] - t_ref[:, :, c])) / scale
            assert dev < 2e-6, (tab, c, dev)
        assert np.all(t[:, :, 13:17] == 0.0)


def test_v01_compat_print_star_through_writer(tmp_path):
    """BASELINE config[3]: the v0.1-compat preset (reference
    README.md:123-155) with ALL the PRINT* switches on
    (PRINTA/PRINTI/PRINTQ/PRINTBIAS, redTime.cc:64-65) end to end
    through the writer: 84-column extended layout, every value finite,
    file round-trips the table at format precision."""
    from redtime_tpu.io.writer import write_result_to_path

    cfg = SolverConfig.v01_compat(print_a=True, print_i=True,
                                  print_q=True, print_bias=True, **SMALL)
    settings = RunSettings(one_loop=True, z_out=(1.0, 0.0))
    cosmo, lin = _toy_inputs()
    res = driver.run_pipeline(cfg, settings, cosmo, lin, mode="fft")
    table = np.asarray(res.table)
    ncol = driver.n_columns(cfg, settings)
    # k | 6 lin | 3 P | 14 A | 14 I | (5 PB + 9 PT + 8 PMR) | 24 Q
    assert ncol == 1 + 6 + 3 + 14 + 14 + 22 + 24 == 84
    assert table.shape == (2, 256, 84)
    assert np.all(np.isfinite(table))
    # extended blocks carry signal in 1-loop mode
    assert np.any(table[:, :, 10:24] != 0)      # A block
    assert np.any(table[:, :, 38:60] != 0)      # PB/PT/PMR block

    out = tmp_path / "v01_printstar.dat"
    write_result_to_path(str(out), res, "params_redTime.dat")
    data = np.loadtxt(str(out))
    assert data.shape == (2 * 256, 84)
    assert np.all(np.isfinite(data))
    direct = table.reshape(-1, 84)
    scale = np.max(np.abs(direct), axis=0, keepdims=True)
    assert np.max(np.abs(data - direct) / (scale + 1e-300)) < 1e-10


def test_modern_13col_transfer(tmp_path):
    """13-column (pip CAMB) transfer files parse through the same loader."""
    import numpy as np
    from redtime_tpu.io.camb import load_linear_data

    k = np.logspace(-4, 1, 50)
    T = 1.0 / (1.0 + k ** 2)
    cols = [k] + [T * (1 + 0.01 * i) for i in range(12)]
    path = tmp_path / "t13.dat"
    np.savetxt(path, np.column_stack(cols))
    # the beta stack needs >= 4 redshift nodes for cubic a-interpolation
    lin = load_linear_data(str(path), [str(path)] * 4,
                           [3.0, 2.0, 1.0, 0.0], modern=True)
    assert lin.t_lnk.shape == (50,)
    assert lin.beta_raw.shape == (4, 50)
    # columns (0-based): k=0, dc=1, db=2, dnu=5; cols[i] = T*(1+0.01*(i-1))
    assert np.allclose(lin.t_Tc, T * 1.00)
    assert np.allclose(lin.t_Tb, T * 1.01)
    assert np.allclose(lin.beta_raw[0], 1.04 * np.ones_like(T))


def test_z_out_ordering_guard():
    cfg = SolverConfig(nk=16, **SMALL)
    with pytest.raises(ValueError, match="greatest to least"):
        _run(cfg, RunSettings(z_out=(0.0, 1.0)))
    with pytest.raises(ValueError, match="precedes z_in"):
        _run(cfg, RunSettings(z_in=1.0, z_out=(3.0, 0.0)))


def test_full_trg_vs_oneloop_consistency():
    """Full-TRG and 1-loop modes are independent computations of the same
    physics; in the weakly nonlinear regime (high z, low k) they must agree
    at the sub-percent level.  This is the main cross-validation for
    full-TRG mode, which has no bundled golden output."""
    cfg = SolverConfig(nk=48, **SMALL)
    s_full = RunSettings(one_loop=False, z_out=(5.0, 0.0))
    s_1l = RunSettings(one_loop=True, z_out=(5.0, 0.0))
    t_full = _run(cfg, s_full)
    t_1l = _run(cfg, s_1l)
    # z=5, lowest third of the k grid: quasi-linear
    lo = slice(0, 16)
    for c in (7, 8, 9):
        rel = np.abs(t_full[0, lo, c] / t_1l[0, lo, c] - 1)
        assert np.max(rel) < 5e-3, (c, np.max(rel))
    # even at z=0 the low-k spectra stay within a few percent
    for c in (7, 8, 9):
        rel = np.abs(t_full[1, lo, c] / t_1l[1, lo, c] - 1)
        assert np.max(rel) < 5e-2, (c, np.max(rel))


def test_custom_k_range_and_z_in():
    """Non-default k range and initial redshift (the reference hardcodes
    kmin/kmax/z_in; here they are config)."""
    cfg = SolverConfig(nk=24, kmin=3e-3, kmax=0.5, **SMALL)
    settings = RunSettings(z_in=100.0, z_out=(2.0, 0.0))
    table = _run(cfg, settings)
    assert np.isclose(table[0, 0, 0], 3e-3)
    assert np.isclose(table[0, -1, 0], 0.5)


def test_extreme_de_growth_table_stays_in_f32_exponent_range():
    """Early-DE-dominated cosmologies (w0 + wa > 1/3) grow D ~ a^3 from
    a_early, blowing the growth table's arbitrary common scale past 1e39.
    The TPU's emulated f64 has f32's exponent range (docs/TPU_NOTES.md),
    so device_put of such a table lands inf and every growth lookup goes
    NaN — this was the real mechanism behind the round-2 'batch > 32'
    device faults.  prepare_model must renormalize the scale away
    (growth_D_f consumes only ratios) while leaving physical cosmologies
    bit-identical."""
    from redtime_tpu import trg

    _, lin = _toy_inputs()
    cfg = SolverConfig(**SMALL)
    extreme = CosmoParams.make(n_s=1.072, sigma_8=1.08, h=0.68,
                               Omega_m=0.30, Omega_b=0.048, Omega_nu=0.005,
                               T_cmb=2.726, w0=-0.44, wa=2.8)
    m = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(extreme, lin)
    for leaf in jax.tree_util.tree_leaves(m):
        a = np.asarray(leaf)
        assert np.all(np.isfinite(a))
        # representable in the TPU's f32-exponent-range emulated f64
        assert np.all(np.abs(a) < 3.0e38), float(np.abs(a).max())
    D0, _ = mdl.growth_D_f(m, 0.0)
    D2, _ = mdl.growth_D_f(m, 2.02)
    D200, _ = mdl.growth_D_f(m, 200.0)
    assert np.allclose(np.asarray(D0), 1.0, atol=1e-10)
    # regression band: host-f64 full-resolution grid gives 0.2043; the
    # SMALL test grid shifts it to ~0.208
    assert np.all((np.asarray(D2) > 0.19) & (np.asarray(D2) < 0.22))
    assert np.all(np.asarray(D200) < np.asarray(D2))

    # physical cosmology: the rescale branch must be an exact no-op
    c0, _ = _toy_inputs()
    m0 = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(c0, lin)
    assert float(np.abs(np.asarray(m0.g_Dnorm)).max()) < 1e30
    assert not np.allclose(np.asarray(m0.g_Dnorm), 1.0)

    # the trial-step finite-range guards in the RHS never bind on entry
    assert trg.LNP_MAX >= 20.0 and trg.LNP_MIN <= -60.0


def test_v01_growth_table_stays_above_f32_normal_floor():
    """The SMALL-end twin of the test above: the v01-compat ramp from
    a_early=1e-50 (reference README.md:135-137) leaves the growth
    table's arbitrary common scale at ~1e-45 — BELOW the f32 normal
    floor, so device_put onto the TPU's f32-exponent-range emulated f64
    flushes the whole table to zero and the solve NaN-crashes the worker
    (measured round 4: run_batch with SolverConfig.v01_compat faulted
    the TPU).  prepare_model must renormalize the small end away too."""
    cosmo, lin = _toy_inputs()
    cfg = SolverConfig.v01_compat(growth_n_lna=16, growth_n_lnk=8,
                                  quad_panels=16, quad_order=8)
    m = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(cosmo, lin)
    for leaf in jax.tree_util.tree_leaves(m):
        a = np.asarray(leaf)
        assert np.all(np.isfinite(a))
        assert np.all(np.abs(a) < 3.0e38), float(np.abs(a).max())
        nz = np.abs(a[a != 0.0])
        if nz.size:
            # representable as NORMAL f32 (no subnormal flush on device)
            assert nz.min() > 1.2e-38, float(nz.min())
    D0, _ = mdl.growth_D_f(m, 0.0)
    assert np.allclose(np.asarray(D0), 1.0, atol=1e-10)
    # growth still behaves: D decreasing toward high z
    D2, _ = mdl.growth_D_f(m, 2.0)
    D50, _ = mdl.growth_D_f(m, 50.0)
    assert np.all(np.asarray(D50) < np.asarray(D2))
    assert np.all(np.asarray(D2) < 1.0)
