"""Adaptive RK integrator tests: exact solutions and scipy cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from redtime_tpu.ode import DOPRI5, RKF45, integrate_dense, integrate_interval


def test_exponential_decay():
    def rhs(t, y):
        return -y

    y0 = jnp.array([1.0, 2.0])
    for tab, tol in ((RKF45, (1e-10, 1e-10)), (DOPRI5, (1e-10, 1e-10))):
        y, h = integrate_interval(rhs, 0.0, 3.0, y0, 0.01, *tol, tab)
        assert np.allclose(np.asarray(y), np.exp(-3.0) * np.array([1., 2.]),
                           rtol=1e-8)


def test_oscillator_vs_scipy():
    def rhs(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = jnp.array([1.0, 0.0])
    y, _ = integrate_interval(rhs, 0.0, 10.0, y0, 0.01, 0.0, 1e-11, DOPRI5)
    ref = solve_ivp(lambda t, y: [y[1], -y[0]], (0, 10), [1, 0],
                    rtol=1e-12, atol=1e-12).y[:, -1]
    assert np.allclose(np.asarray(y), ref, atol=1e-8)


def test_boundary_hit_exact():
    # final clipped step must land exactly on t1
    def rhs(t, y):
        return jnp.ones_like(y)

    y, _ = integrate_interval(rhs, 0.0, 0.7777777, jnp.array([0.0]),
                              1.0, 1e-12, 1e-12, RKF45)
    assert np.isclose(float(y[0]), 0.7777777, rtol=0, atol=1e-15)


def test_loose_tolerance_controller_behaves():
    # stiff-ish decay with loose rel tolerance, mirrors TRG settings
    def rhs(t, y):
        return -10.0 * y

    y, _ = integrate_interval(rhs, 0.0, 2.0, jnp.array([1.0]), 0.02,
                              1e-7, 1e-2, RKF45)
    assert np.isclose(float(y[0]), np.exp(-20.0), rtol=0.05, atol=1e-8)


def test_jit_and_vmap():
    def rhs(t, y):
        return -y * t

    f = jax.jit(lambda y0: integrate_interval(rhs, 0.0, 2.0, y0, 0.01,
                                              0.0, 1e-10, DOPRI5)[0])
    ys = jax.vmap(f)(jnp.arange(1.0, 4.0)[:, None])
    assert np.allclose(np.asarray(ys[:, 0]),
                       np.arange(1.0, 4.0) * np.exp(-2.0), rtol=1e-8)


def test_dense_output_matches_exact_solution():
    # free-stepping dense output vs the closed form at interior nodes,
    # including the final node == t1 (theta = 1 lands on the step solution)
    def rhs(t, y):
        return -y * t

    xs = jnp.linspace(0.25, 3.0, 12)
    table, y1, _ = integrate_dense(rhs, 0.0, 3.0, jnp.array([1.0, 2.0]),
                                   0.01, 0.0, 1e-9, xs, DOPRI5)
    exact = np.exp(-np.asarray(xs)[:, None] ** 2 / 2) * np.array([1.0, 2.0])
    assert np.allclose(np.asarray(table), exact, rtol=3e-8)
    assert np.allclose(np.asarray(y1), exact[-1], rtol=3e-8)


def test_dense_growth_tables_match_scan_path():
    # the growth_dense option must reproduce the node-stopped scan tables
    # within its at-tolerance trajectory band (probe_growth_dense.py)
    import dataclasses

    from __graft_entry__ import _cosmo, _example_inputs
    from redtime_tpu import model as mdl
    from redtime_tpu.config import SolverConfig

    cfg_s = SolverConfig(growth_n_lna=40, growth_n_lnk=8, quad_panels=8,
                         quad_order=8, growth_rtol=1e-8)
    cfg_d = dataclasses.replace(cfg_s, growth_dense=True)
    c, lin = _cosmo(), _example_inputs(cfg_s)
    _, G_s, dD_s = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg_s, c, l))(c, lin)
    _, G_d, dD_d = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg_d, c, l))(c, lin)
    assert np.all(np.isfinite(np.asarray(G_d)))
    assert np.allclose(np.asarray(G_d), np.asarray(G_s), rtol=1e-5)
    assert np.allclose(np.asarray(dD_d), np.asarray(dD_s), rtol=1e-4)


def test_dop853_accuracy_and_order():
    # 8th-order tableau: exact-solution accuracy at loose tolerance, and
    # far fewer controller attempts than DOPRI5 on a smooth long interval
    # (the growth a_early ramp's regime)
    from redtime_tpu.ode import DOP853

    def rhs(t, y):
        return -y

    y0 = jnp.array([1.0, 2.0])
    y, _, n8 = integrate_interval(rhs, 0.0, 30.0, y0, 0.01, 0.0, 1e-6,
                                  DOP853, return_stats=True)
    assert np.allclose(np.asarray(y), np.exp(-30.0) * np.array([1., 2.]),
                       rtol=1e-6)
    _, _, n5 = integrate_interval(rhs, 0.0, 30.0, y0, 0.01, 0.0, 1e-6,
                                  DOPRI5, return_stats=True)
    assert int(n8) < int(n5)


def test_integrate_nodes_bitexact_vs_scan():
    # the flat node-stopped loop must reproduce a scan of
    # integrate_interval segments (h carried) to the last ulp — same
    # controller arithmetic, different lowering
    from redtime_tpu.ode import integrate_nodes

    def rhs(t, y):
        return jnp.array([y[1], -jnp.sin(y[0])])  # pendulum

    y0 = jnp.array([1.2, 0.0])
    nodes = np.linspace(0.5, 8.0, 23)
    rows, hf = integrate_nodes(rhs, 0.0, jnp.asarray(nodes), y0, 0.01,
                               0.0, 1e-8, DOPRI5)
    y, h = y0, jnp.float64(0.01)
    t = 0.0
    exp = []
    for t1 in nodes:
        y, h = integrate_interval(rhs, t, float(t1), y, h, 0.0, 1e-8,
                                  DOPRI5)
        exp.append(np.asarray(y))
        t = float(t1)
    assert np.array_equal(np.asarray(rows), np.stack(exp))
    assert float(hf) == float(h)


def test_integrate_nodes_truncation_poisons():
    from redtime_tpu.ode import integrate_nodes

    def rhs(t, y):
        return -y

    rows, _ = integrate_nodes(rhs, 0.0, jnp.asarray([1.0, 2.0, 3.0]),
                              jnp.array([1.0]), 0.01, 0.0, 1e-8, DOPRI5,
                              max_steps=25)
    r = np.asarray(rows)
    assert np.isfinite(r[0]).all()          # first node reached
    assert np.isnan(r[-1]).all()            # later nodes NaN-poisoned


def test_growth_massless_columns_identical():
    # a massless-nu model's growth ODE has no k dependence: the batched
    # build integrates one lane and broadcasts — columns exactly equal
    from __graft_entry__ import _example_inputs
    from redtime_tpu import model as mdl
    from redtime_tpu.config import CosmoParams, SolverConfig

    cfg = SolverConfig(growth_n_lna=20, growth_n_lnk=8)
    c = CosmoParams.make(n_s=0.96, sigma_8=0.8, h=0.7, Omega_m=0.3,
                         Omega_b=0.05, Omega_nu=0.0, T_cmb=2.726,
                         w0=-1.0, wa=0.0)
    lin = _example_inputs(cfg, nu=False)
    _, G, dD = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg, c, l))(c, lin)
    G, dD = np.asarray(G), np.asarray(dD)
    assert G.shape == (21, 9)
    assert np.array_equal(G, np.broadcast_to(G[:, :1], G.shape))
    assert np.array_equal(dD, np.broadcast_to(dD[:, :1], dD.shape))
    assert np.all(np.isfinite(G)) and np.all(G > 0)


def test_growth_shared_ramp_matches_per_k_lane():
    # the shared a_early ramp + single-controller table system must stay
    # inside the controller band of an independently-integrated single k
    # lane (the superseded per-k formulation; probe_growth_shared.py
    # measures the full-table deviation at 2.8e-12 normalized, z<=5)
    from __graft_entry__ import _cosmo, _example_inputs
    from redtime_tpu import background as bg
    from redtime_tpu import model as mdl
    from redtime_tpu.config import SolverConfig
    from redtime_tpu.ode import DOP853

    cfg = SolverConfig(growth_n_lna=20, growth_n_lnk=8)
    c, lin = _cosmo(), _example_inputs(cfg)
    lna, G, dD = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg, c, l))(c, lin)

    # per-k reference lane: own ramp + own controller at k node j
    d = bg.derived(c)
    f_nu = c.Omega_nu / c.Omega_m
    _, lnk_nodes = mdl.growth_nodes(cfg)
    kq = np.clip(np.exp(lnk_nodes), cfg.beta_k_min, cfg.beta_k_max)
    beta_cols = mdl._beta_reduce_k(lin, kq)
    j = 4

    def rhs(x, y):
        return mdl._growth_rhs(c, d, f_nu, jnp.asarray(lin.beta_a),
                               beta_cols[:, j], x, y)

    y, h = integrate_interval(rhs, np.log(cfg.a_early),
                              np.log(cfg.growth_a_min),
                              jnp.array([1.0, 1.0]), 1e-6, 0.0,
                              cfg.growth_rtol, DOP853)
    rows = [np.asarray(y)]
    lna = np.asarray(lna)
    for x0, x1 in zip(lna[:-1], lna[1:]):
        y, h = integrate_interval(rhs, float(x0), float(x1), y, h, 0.0,
                                  cfg.growth_rtol, DOPRI5)
        rows.append(np.asarray(y))
    rows = np.stack(rows)
    # normalized trajectories agree within the controller band: the shared
    # ramp's one-stage boundary perturbation shows at the early rows
    # (within growth_rtol) and decays with the decaying mode toward z=0
    lane_G = np.asarray(G)[:, j]
    rel = np.abs(lane_G / lane_G[-1] / (rows[:, 0] / rows[-1, 0]) - 1.0)
    assert rel.max() < cfg.growth_rtol          # all rows: inside rtol
    assert rel[np.exp(lna) >= 0.1].max() < 1e-8  # z <= 9: decayed to the
    # shared-controller step-phasing band (ode.py docstring: ~1e-8)
