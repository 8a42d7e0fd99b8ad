"""Adaptive embedded Runge-Kutta integration, jittable.

Replaces the reference's GSL odeiv stack (`gsl_odeiv_evolve_apply` +
`gsl_odeiv_control_y_new` + `gsl_odeiv_step_rkf45`, used at
`src/redTime.cc:1589-1630` and `AU_cosmological_parameters.h:170-190`) with a
`lax.while_loop` state machine whose accept/reject/step-size logic follows
GSL's "standard controller" exactly:

  D0_i = eps_abs + eps_rel * |y_i|          (a_y = 1, a_dydt = 0)
  r    = max_i |yerr_i| / D0_i
  r > 1.1  -> reject, h *= max(0.9 * r^(-1/ord), 0.2)
  r < 0.5  -> accept, h *= clip(0.9 * r^(-1/(ord+1)), 1, 5)
  else     -> accept, h unchanged

and whose boundary handling matches `gsl_odeiv_evolve_apply`: the step is
clipped to land exactly on t1, and the post-adjustment clipped step is the
suggestion carried to the next step.  Matching this machinery step-for-step
is what lets the solver track the reference's (loosely-toleranced)
trajectories to ~1e-8 instead of ~tolerance.

The whole interval integration is one fused XLA while_loop over the state
tensor — the TPU-native replacement for GSL's per-component C loops.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Tableau(NamedTuple):
    c: np.ndarray      # [s]    stage times
    a: np.ndarray      # [s, s] stage coefficients (strictly lower triangular)
    b: np.ndarray      # [s]    solution weights (higher order)
    e: np.ndarray      # [s]    error weights (y_high - y_low)
    order: int         # controller order (GSL step "order")


def _frac(num, den):
    return float(num) / float(den)


# GSL's rkf45 tableau (gsl/ode-initval/rkf45.c); solution is the 5th-order
# combination, error = y5 - y4.
RKF45 = Tableau(
    c=np.array([0.0, 0.25, 0.375, _frac(12, 13), 1.0, 0.5]),
    a=np.array([
        [0, 0, 0, 0, 0, 0],
        [0.25, 0, 0, 0, 0, 0],
        [_frac(3, 32), _frac(9, 32), 0, 0, 0, 0],
        [_frac(1932, 2197), _frac(-7200, 2197), _frac(7296, 2197), 0, 0, 0],
        [_frac(8341, 4104), _frac(-32832, 4104), _frac(29440, 4104),
         _frac(-845, 4104), 0, 0],
        [_frac(-6080, 20520), _frac(41040, 20520), _frac(-28352, 20520),
         _frac(9295, 20520), _frac(-5643, 20520), 0],
    ]),
    b=np.array([_frac(902880, 7618050), 0.0, _frac(3953664, 7618050),
                _frac(3855735, 7618050), _frac(-1371249, 7618050),
                _frac(277020, 7618050)]),
    e=np.array([_frac(1, 360), 0.0, _frac(-128, 4275), _frac(-2197, 75240),
                _frac(1, 50), _frac(2, 55)]),
    order=5,
)

# Dormand-Prince 5(4) (used for the growth ODE, where the reference uses
# rk8pd; run at tight rtol so both sit on the true solution).
DOPRI5 = Tableau(
    c=np.array([0.0, 0.2, 0.3, 0.8, _frac(8, 9), 1.0, 1.0]),
    a=np.array([
        [0, 0, 0, 0, 0, 0, 0],
        [0.2, 0, 0, 0, 0, 0, 0],
        [_frac(3, 40), _frac(9, 40), 0, 0, 0, 0, 0],
        [_frac(44, 45), _frac(-56, 15), _frac(32, 9), 0, 0, 0, 0],
        [_frac(19372, 6561), _frac(-25360, 2187), _frac(64448, 6561),
         _frac(-212, 729), 0, 0, 0],
        [_frac(9017, 3168), _frac(-355, 33), _frac(46732, 5247),
         _frac(49, 176), _frac(-5103, 18656), 0, 0],
        [_frac(35, 384), 0, _frac(500, 1113), _frac(125, 192),
         _frac(-2187, 6784), _frac(11, 84), 0],
    ]),
    b=np.array([_frac(35, 384), 0, _frac(500, 1113), _frac(125, 192),
                _frac(-2187, 6784), _frac(11, 84), 0]),
    e=np.array([_frac(71, 57600), 0, _frac(-71, 16695), _frac(71, 1920),
                _frac(-17253, 339200), _frac(22, 525), _frac(-1, 40)]),
    order=5,
)


def _dop853_tableau() -> Tableau:
    """Hairer's 8th-order Dormand-Prince DOP853 (Solving ODEs I), 12
    stages, with the 5th-order embedded error weights.  Coefficients come
    from scipy's published table (scipy.integrate._ivp.dop853_coefficients)
    at import time — the same public constants as Hairer's dopri853.f.

    Role: the growth ODE's a_early ramp (39 e-folds of smooth background
    evolution with no output nodes) — the reference itself integrates
    growth with GSL's 8th-order rk8pd (AU_cosmological_parameters.h:172),
    so an 8th-order ramp is the closer analog AND takes several-fold
    fewer controller attempts than DOPRI5 at equal tolerance.  The
    controller 'order' follows the GSL convention of using the method
    order (GSL's rkf45/rk8pd do the same with their lower-order error
    estimates)."""
    from scipy.integrate._ivp import dop853_coefficients as _d
    s = int(_d.N_STAGES)     # 12; E5[12] == 0 so the FSAL stage is unused
    return Tableau(c=np.array(_d.C[:s]), a=np.array(_d.A[:s, :s]),
                   b=np.array(_d.B), e=np.array(_d.E5[:s]), order=8)


DOP853 = _dop853_tableau()


def rk_step(rhs: Callable, t, h, y, tab: Tableau, return_stages=False):
    """One embedded RK step: returns (y_new, yerr[, ks]).

    The stage loop is a lax.fori_loop so the RHS appears ONCE in the
    compiled graph rather than s times — the RHS here can contain the whole
    FAST-PT engine, and TPU remote-compile time scales with graph size."""
    s = len(tab.c)
    dt_y = y.dtype
    # time/step control stays f64; y-updates in the state dtype (an f32
    # state must not silently promote through f64 coefficients)
    a_mat = jnp.asarray(tab.a, dtype=dt_y)
    c_vec = jnp.asarray(tab.c)
    hy = jnp.asarray(h, dtype=dt_y)

    def stage(i, ks):
        yi = y + hy * jnp.tensordot(a_mat[i], ks, axes=1)
        return ks.at[i].set(rhs(t + c_vec[i] * h, yi))

    ks = jax.lax.fori_loop(0, s, stage,
                           jnp.zeros((s,) + y.shape, dtype=dt_y))
    y_new = y + hy * jnp.tensordot(jnp.asarray(tab.b, dtype=dt_y), ks,
                                   axes=1)
    yerr = hy * jnp.tensordot(jnp.asarray(tab.e, dtype=dt_y), ks, axes=1)
    if return_stages:
        return y_new, yerr, ks
    return y_new, yerr


def integrate_interval(rhs: Callable, t0, t1, y0, h0,
                       eps_abs: float, eps_rel: float,
                       tab: Tableau = RKF45,
                       max_steps: int = 1_000_000,
                       return_stats: bool = False):
    """Integrate y' = rhs(t, y) from t0 to t1 (forward, t1 >= t0).

    Mirrors the reference's evolve loop `while ((t1 - t)*h > 0) apply(...)`
    (redTime.cc:1614-1630).  Returns (y(t1), h_suggest) where h_suggest is
    GSL's step suggestion after the final (boundary-clipped) step — carrying
    it across output times is part of trajectory parity.
    """
    ord_ = tab.order

    def cond(state):
        t, y, h, n = state
        return (t < t1) & (n < max_steps)

    def body(state):
        t, y, h, n = state
        dt = t1 - t
        final = h > dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr = rk_step(rhs, t, h_try, y, tab)

        d0 = eps_abs + eps_rel * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)

        dec = r > 1.1
        fac_dec = jnp.maximum(0.9 * r ** (-1.0 / ord_), 0.2)
        fac_inc = jnp.clip(0.9 * r ** (-1.0 / (ord_ + 1.0)), 1.0, 5.0)
        fac = jnp.where(dec, fac_dec, jnp.where(r < 0.5, fac_inc, 1.0))
        h_next = h_try * fac

        t_acc = jnp.where(final, t1, t + h_try)
        t_out = jnp.where(dec, t, t_acc)
        # y is always a single array (rk_step stacks stages on it)
        y_out = jnp.where(dec, y, y_new)
        return (t_out, y_out, h_next, n + 1)

    t0 = jnp.asarray(t0, dtype=jnp.float64)
    h0 = jnp.asarray(h0, dtype=jnp.float64)
    t, y, h, n = jax.lax.while_loop(cond, body, (t0, y0, h0, jnp.array(0)))
    # Truncation guard: the loop can also exit at n == max_steps, or spin
    # there after h underflows to 0 (persistent rejection: h *= 0.2 until
    # it denormalizes; fac_inc cannot rescue 0).  The reference prints an
    # integrator-failure warning (redTime.cc:1628-1632); here the state
    # is POISONED with NaN instead, so the failure surfaces through the
    # batch fault isolation (driver.finite_report names the model) rather
    # than flowing on as a silently mid-interval table.
    y = jnp.where(t >= t1, y, jnp.nan)
    if return_stats:
        return y, h, n     # n counts step ATTEMPTS (accepted + rejected)
    return y, h


def integrate_nodes(rhs: Callable, t0, nodes, y0, h0,
                    eps_abs: float, eps_rel: float,
                    tab: Tableau = RKF45,
                    max_steps: int = 1_000_000,
                    return_stats: bool = False):
    """Integrate from t0 through the sorted stop ``nodes`` (all > t0),
    recording y at every node, in ONE while_loop.

    Applies bit-identical controller arithmetic and boundary clipping to a
    scan of `integrate_interval` over the node segments with the step
    suggestion carried across boundaries — the trajectory (and therefore
    every recorded row) is the same to the last ulp.  What changes is the
    lowering: a `lax.scan` whose body is itself a `lax.while_loop` pays the
    inner loop's setup/teardown once per segment; on a 101-node growth
    table (~1 accepted step per node) that bookkeeping rivals the step
    arithmetic itself on the host backend.  Here there is exactly one loop
    of (total step attempts) iterations and the node bookkeeping is a
    masked [m]-row select per iteration.

    Returns (rows [len(nodes), *y.shape], h_suggest[, n_attempts]).
    Rows past a truncated integration (max_steps exhausted or h underflow)
    are NaN-poisoned like integrate_interval's final state.
    """
    ord_ = tab.order
    nodes = jnp.asarray(nodes, dtype=jnp.float64)
    m = nodes.shape[0]

    def cond(state):
        t, y, h, seg, n, rows = state
        return (seg < m) & (n < max_steps)

    def body(state):
        t, y, h, seg, n, rows = state
        t1 = nodes[jnp.minimum(seg, m - 1)]
        dt = t1 - t
        final = h > dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr = rk_step(rhs, t, h_try, y, tab)

        d0 = eps_abs + eps_rel * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)

        dec = r > 1.1
        fac_dec = jnp.maximum(0.9 * r ** (-1.0 / ord_), 0.2)
        fac_inc = jnp.clip(0.9 * r ** (-1.0 / (ord_ + 1.0)), 1.0, 5.0)
        fac = jnp.where(dec, fac_dec, jnp.where(r < 0.5, fac_inc, 1.0))
        h_next = h_try * fac

        t_acc = jnp.where(final, t1, t + h_try)
        t_out = jnp.where(dec, t, t_acc)
        y_out = jnp.where(dec, y, y_new)
        # segment complete exactly when integrate_interval's cond (t < t1)
        # would exit: an accepted step that reached (or passed, within
        # one ulp of non-final arithmetic) the node
        reached = (~dec) & (t_out >= t1)
        rows = jnp.where(
            ((jnp.arange(m) == seg) & reached).reshape(
                (m,) + (1,) * y.ndim),
            y_out, rows)
        # the scan-of-intervals path restarts every segment at the STATIC
        # node value (x0 = nodes[i]); pin t likewise so a non-final step
        # that lands past the node by an ulp cannot skew the next segment
        t_out = jnp.where(reached, t1, t_out)
        return (t_out, y_out, h_next, seg + reached.astype(seg.dtype),
                n + 1, rows)

    t0 = jnp.asarray(t0, dtype=jnp.float64)
    h0 = jnp.asarray(h0, dtype=jnp.float64)
    rows0 = jnp.zeros((m,) + y0.shape, dtype=y0.dtype)
    t, y, h, seg, n, rows = jax.lax.while_loop(
        cond, body, (t0, y0, h0, jnp.asarray(0), jnp.asarray(0), rows0))
    # truncation poisoning: rows at/after an unreached segment go NaN
    rows = jnp.where(
        (jnp.arange(m) < seg).reshape((m,) + (1,) * y0.ndim),
        rows, jnp.nan)
    if return_stats:
        return rows, h, n
    return rows, h


# Dormand-Prince 5(4) continuous extension (4th-order dense output).  The
# d-coefficients are the published constants of Hairer/Norsett/Wanner's
# DOPRI5 (Solving ODEs I, and the public dopri5.f CONTD5 routine); the
# interpolant over an accepted step [t, t+h] is
#   y(t + theta h) = r1 + theta (r2 + (1-theta)(r3 + theta (r4 + (1-theta) r5)))
# with r1..r5 built from y0, y1, k1, k7 and the d-weighted stage sum.
DOPRI5_D = np.array([
    _frac(-12715105075.0, 11282082432.0),
    0.0,
    _frac(87487479700.0, 32700410799.0),
    _frac(-10690763975.0, 1880347072.0),
    _frac(701980252875.0, 199316789632.0),
    _frac(-1453857185.0, 822651844.0),
    _frac(69997945.0, 29380423.0),
])


def integrate_dense(rhs: Callable, t0, t1, y0, h0,
                    eps_abs: float, eps_rel: float, xs,
                    tab: Tableau = DOPRI5,
                    max_steps: int = 1_000_000,
                    return_stats: bool = False):
    """Integrate t0 -> t1 with FREE adaptive stepping and fill y at the
    output nodes ``xs`` (sorted, all in (t0, t1]) from the 4th-order
    continuous extension of each accepted step.

    Replaces a node-stopped scan (one `integrate_interval` per table
    segment): the controller's step count is then set by the solution's
    stiffness alone, not by the table resolution — on the growth tables
    (101 lna nodes over 7 e-folds) this cuts step attempts several-fold.
    The reference instead restarts GSL evolve at every table node
    (`AU_cosmological_parameters.h:699-724`); at growth_rtol both paths
    sit on the true trajectory (validated vs the scan path and the growth
    goldens in tests/test_ode.py / test_linear_golden.py).

    Returns (ys [len(xs), *y.shape], y(t1), h_suggest[, n_attempts]).
    Only DOPRI5 dense output is wired; asserts on other tableaus.
    """
    assert tab is DOPRI5, "dense output implemented for DOPRI5 only"
    ord_ = tab.order
    xs = jnp.asarray(xs, dtype=jnp.float64)
    m = xs.shape[0]
    d_vec = DOPRI5_D

    def cond(state):
        t, y, h, n, table = state
        return (t < t1) & (n < max_steps)

    def body(state):
        t, y, h, n, table = state
        dt = t1 - t
        final = h > dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr, ks = rk_step(rhs, t, h_try, y, tab, return_stages=True)

        d0 = eps_abs + eps_rel * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)

        dec = r > 1.1
        fac_dec = jnp.maximum(0.9 * r ** (-1.0 / ord_), 0.2)
        fac_inc = jnp.clip(0.9 * r ** (-1.0 / (ord_ + 1.0)), 1.0, 5.0)
        fac = jnp.where(dec, fac_dec, jnp.where(r < 0.5, fac_inc, 1.0))
        h_next = h_try * fac

        t_acc = jnp.where(final, t1, t + h_try)
        # dense fill of every node inside the accepted step (t, t_acc]
        dt_y = y.dtype
        hy = jnp.asarray(h_try, dtype=dt_y)
        dy = y_new - y
        r3 = hy * ks[0] - dy
        r4 = dy - hy * ks[-1] - r3
        r5 = hy * jnp.tensordot(jnp.asarray(d_vec, dtype=dt_y), ks, axes=1)
        theta = ((xs - t) / h_try).astype(dt_y)        # [m]
        th = theta.reshape((m,) + (1,) * y.ndim)
        vals = y + th * (dy + (1.0 - th) * (r3 + th * (r4 + (1.0 - th) * r5)))
        mask = (~dec) & (xs > t) & (xs <= t_acc)
        table = jnp.where(mask.reshape(th.shape), vals, table)

        t_out = jnp.where(dec, t, t_acc)
        y_out = jnp.where(dec, y, y_new)
        return (t_out, y_out, h_next, n + 1, table)

    t0 = jnp.asarray(t0, dtype=jnp.float64)
    h0 = jnp.asarray(h0, dtype=jnp.float64)
    table0 = jnp.full((m,) + y0.shape, jnp.nan, dtype=y0.dtype)
    t, y, h, n, table = jax.lax.while_loop(
        cond, body, (t0, y0, h0, jnp.array(0), table0))
    # same truncation poisoning as integrate_interval: a loop that ran out
    # of steps (or stalled on h -> 0) must not hand back a half-filled table
    y = jnp.where(t >= t1, y, jnp.nan)
    table = jnp.where(t >= t1, table, jnp.nan)
    if return_stats:
        return table, y, h, n
    return table, y, h
