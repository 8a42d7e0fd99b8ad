"""Failure-path behavior: truncated integrations poison with NaN (so the
batch fault isolation names the model), malformed inputs error with
diagnostics instead of shifting fields or merging lines, and out-of-table
settings fail loudly like the reference's aborts."""

import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _cosmo, _example_inputs
from redtime_tpu import driver, interp
from redtime_tpu.config import RunSettings, SolverConfig
from redtime_tpu.grids import make_grids, pab_extension_matrix
from redtime_tpu.io import native, params
from redtime_tpu.ode import RKF45, integrate_interval


def test_truncated_integration_poisons_nan():
    """Exhausting max_steps before t1 returns NaN, not a silently
    mid-interval state (the reference warns on integrator failure,
    redTime.cc:1628-1632; here the NaN surfaces via finite_report)."""
    rhs = lambda t, y: -y
    y0 = jnp.ones(4)
    y, h = integrate_interval(rhs, 0.0, 10.0, y0, 1e-8, 1e-12, 1e-12,
                              RKF45, max_steps=3)
    assert bool(jnp.isnan(y).all())
    # and a completable interval stays finite
    y, h = integrate_interval(rhs, 0.0, 1.0, y0, 1e-2, 1e-10, 1e-10, RKF45)
    assert bool(jnp.isfinite(y).all())
    np.testing.assert_allclose(np.asarray(y), np.exp(-1.0), rtol=1e-8)


def test_params_truncation_diagnostic(tmp_path):
    p = tmp_path / "params_trunc.dat"
    p.write_text("0.96 0.8 0.68 0.3 0.048 0.0 2.726 -1.0 0.0\n1 0 1 1\n")
    with pytest.raises(ValueError, match="truncated"):
        params.read_params_file(str(p))


def test_params_roundtrip_empty_nu_root(tmp_path):
    """A massless-nu config (empty nu root, no interp redshifts) must
    survive write -> read (an empty token would otherwise shift every
    later positional field)."""
    p0 = params.ParamsFile(
        0.96, 0.8, 0.68, 0.3, 0.048, 0.0, 2.726, -1.0, 0.0,
        1, 0, 1, 1, 200.0, [1.0, 0.0], "camb_transfer_z0.dat", 0, "", [])
    path = str(tmp_path / "params_rt.dat")
    params.write_params_file(path, p0)
    p1 = params.read_params_file(path)
    assert p1.z_out == p0.z_out and p1.transfer_file == p0.transfer_file
    assert p1.z_interp_str == [] and p1.nu_transfer_root == "none"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_rejects_short_rows(tmp_path):
    """A numeric row with fewer than ncols columns errors with a format
    diagnostic instead of silently merging lines (bare strtod skips
    newlines)."""
    f = tmp_path / "short.dat"
    f.write_text("# header\n1.0 2.0 3.0\n4.0 5.0 6.0\n")
    with pytest.raises(ValueError, match="fewer than 7 columns"):
        native.parse_table(str(f), 7)
    # and a well-formed 3-column read still works
    out = native.parse_table(str(f), 3)
    assert out.shape == (2, 3) and out[1, 2] == 6.0


def test_numpy_fallback_empty_file(tmp_path, monkeypatch):
    """The numpy fallback must return shape (0, ncols) for an empty file
    (a bare (1, 0) defeated callers' no-rows checks), exercised by
    forcing the lib-absent path."""
    f = tmp_path / "empty.dat"
    f.write_text("# only comments\n")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")   # loadtxt's empty-input warning
        out = native.parse_table(str(f), 7)
    assert out.shape[0] == 0


def test_growth_range_validation():
    """z_in beyond the growth table must raise (the reference aborts on
    out-of-range a; the table lookup would silently extrapolate)."""
    cfg = SolverConfig(growth_n_lna=40, growth_n_lnk=16, quad_panels=64)
    lin = _example_inputs(cfg)
    settings = RunSettings(one_loop=True, z_in=1500.0, z_out=(0.0,))
    with pytest.raises(ValueError, match="growth table"):
        driver.run_pipeline(cfg, settings, _cosmo(0), lin)


def test_pab_matrix_interior_rows_match_interp():
    """Sync guard: pab_extension_matrix's interior/edge bracketing must
    equal interp.weight_matrix_np (the findN/cubic/linear semantics live
    in both; only the right-extrapolation tail differs by design)."""
    g = make_grids(SolverConfig())
    M, v = pab_extension_matrix(g)
    W = interp.weight_matrix_np(np.asarray(g.lnk), np.asarray(g.lnk_ext))
    inside = (g.lnk_ext >= g.lnk[0]) & (g.lnk_ext <= g.lnk[-1])
    np.testing.assert_allclose(M[inside], W[inside], rtol=0, atol=1e-14)
    assert np.all(v[inside] == 0.0)
