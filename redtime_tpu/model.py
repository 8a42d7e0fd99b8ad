"""Per-cosmology model preparation: growth tables, beta_P, linear power.

This replaces the reference's lazily-initialized `cosmological_parameters`
singleton (`AU_cosmological_parameters.h`, process-lifetime static caches)
with an explicit, jitted, vmappable `prepare_model` step returning a `Model`
pytree.  All tables the C++ builds on first call — the (lna, lnk) growth
tables (:639-731), the beta_P neutrino table (:513-630), the transfer table
(:790-832), the sigma_8 normalization (:834-891) — become arrays carried in
the pytree, pre-reduced onto the static solver k-grid so the hot path does
only 1-D dynamic interpolation in time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from redtime_tpu import background as bg
from redtime_tpu import interp
from redtime_tpu.config import CosmoParams, SolverConfig
from redtime_tpu.grids import make_grids
from redtime_tpu.io.camb import LinearData
from redtime_tpu.ode import (DOP853, DOPRI5, integrate_dense,
                             integrate_interval)


class Model(NamedTuple):
    """Prepared per-cosmology state (a pytree; batch = stacked Models)."""

    cosmo: CosmoParams
    # growth tables, k-axis already reduced to the solver grid
    # (reference builds (n_lna+1) x (n_lnk+1) tables, :661-724)
    g_lna: jnp.ndarray       # [n_lna+1]
    g_G: jnp.ndarray         # [n_lna+1, nk]   G = D/a (x a_early; the
    # common scale cancels in growth_D_f's lna=0 normalization)
    g_dDda: jnp.ndarray      # [n_lna+1, nk]   dD/da (x a_early)
    g_Dnorm: jnp.ndarray     # [nk]            G interpolated at lna=0
    # beta_P table reduced over k to the solver grid (raw delta_nu/delta_c;
    # multiply by f_nu at evaluation)
    beta_a: jnp.ndarray      # [nz]
    beta_solver: jnp.ndarray  # [nz, nk]
    # z=0 cb transfer function at the solver grid (normalized to T(k_min)=1)
    T_solver: jnp.ndarray    # [nk]
    # scalars
    norm: jnp.ndarray        # sigma_8 normalization of P_lin
    sigmaV2_z0: jnp.ndarray  # velocity dispersion at z=0

    @property
    def f_nu(self):
        return self.cosmo.Omega_nu / self.cosmo.Omega_m

    @property
    def f_cb(self):
        return 1.0 - self.f_nu


# ---------------------------------------------------------------------------
# static helpers (numpy, cached per config)

@functools.lru_cache(maxsize=8)
def growth_nodes(cfg: SolverConfig):
    """Growth-table axes (reference :677-687): lna in [ln a_min, ln a_max],
    lnk in [ln k_min, ln k_max], inclusive endpoints."""
    lna_min = np.log(cfg.growth_a_min)
    dlna = np.log(cfg.growth_a_max / cfg.growth_a_min) / cfg.growth_n_lna
    lna = lna_min + dlna * np.arange(cfg.growth_n_lna + 1)
    lnk_min = np.log(cfg.growth_k_min)
    dlnk = np.log(cfg.growth_k_max / cfg.growth_k_min) / cfg.growth_n_lnk
    lnk = lnk_min + dlnk * np.arange(cfg.growth_n_lnk + 1)
    return lna, lnk


@functools.lru_cache(maxsize=8)
def growth_k_reduction(cfg: SolverConfig) -> np.ndarray:
    """Static weight matrix W [nk, n_lnk+1]: growth-table values at the
    solver k-grid = table @ W.T, using the tabulated_function y-axis rules
    (k clamped to the table range, reference :651-659)."""
    grids = make_grids(cfg)
    _, lnk_nodes = growth_nodes(cfg)
    lnk_q = np.clip(grids.lnk, np.log(cfg.growth_k_min),
                    np.log(cfg.growth_k_max))
    return interp.weight_matrix_np(lnk_nodes, lnk_q)


@functools.lru_cache(maxsize=8)
def quad_nodes(cfg: SolverConfig):
    """Composite Gauss-Legendre nodes/weights on [quad_lnk_lo, quad_lnk_hi].

    Replaces gsl_integration_qag (key=6, rel 1e-4; reference :849-874) with a
    fixed-order panel rule whose actual error is far below the reference's
    requested tolerance; the integrands are smooth except for a negligible
    oscillatory UV tail.
    """
    x, w = np.polynomial.legendre.leggauss(cfg.quad_order)
    edges = np.linspace(cfg.quad_lnk_lo, cfg.quad_lnk_hi, cfg.quad_panels + 1)
    lo, hi = edges[:-1, None], edges[1:, None]
    nodes = (0.5 * (hi - lo) * x[None, :] + 0.5 * (hi + lo)).ravel()
    weights = (0.5 * (hi - lo) * w[None, :]).ravel()
    return nodes, weights


# ---------------------------------------------------------------------------
# beta_P evaluation

def _beta_reduce_k(lin: LinearData, k_query: np.ndarray) -> jnp.ndarray:
    """Reduce the raw beta table over its k axis at the (clamped) query
    points -> [nz, len(k_query)].  The 2-D tabulated_function interpolation
    is separable, so reducing one axis first is exact."""
    if lin.beta_raw.shape[0] == 0:
        return jnp.zeros((0, len(k_query)))

    def one(kq):
        i0, w = interp.axis_weights(lin.beta_k, kq)
        block = jax.lax.dynamic_slice(
            jnp.asarray(lin.beta_raw), (jnp.zeros_like(i0), i0),
            (lin.beta_raw.shape[0], 4))
        return block @ w

    return jax.vmap(one, out_axes=1)(jnp.asarray(k_query))


def beta_raw_at_a(beta_a, beta_cols, a):
    """Interpolate the k-reduced beta table in a (tabulated_function x-axis
    rules; linear extrapolation below the first node).  a must already obey
    the reference clamps.  Returns beta/f_nu values, shape beta_cols.shape[1:].
    """
    w = interp.axis_weights_full(beta_a, a)
    return jnp.tensordot(w, beta_cols, axes=1)


def beta_P_solver(model: Model, a):
    """beta_P(a, k) on the solver grid [nk] (reference :513-637).

    Clamps: a > 1 evaluates at a = 1; returns 0 when f_nu < 1e-10 or the
    table is empty (static).  k was clamped at reduction time.
    """
    if model.beta_a.shape[0] == 0:
        return jnp.zeros(model.beta_solver.shape[1])
    a_c = jnp.minimum(a, 1.0)
    raw = beta_raw_at_a(model.beta_a, model.beta_solver, a_c)
    return jnp.where(model.f_nu < 1e-10, 0.0, model.f_nu * raw)


# ---------------------------------------------------------------------------
# growth ODE

def _growth_rhs(c: CosmoParams, d, f_nu, beta_a, beta_col, x, y):
    """d/d(ln a) of the SCALED growth state (w, v) = (D a_early / a,
    dD/da a_early); same physics as the reference's (D, dD/da) system in a
    (:133-158, F_MG = 0), rewritten so that BOTH the state and every RHS
    coefficient stay inside f32's exponent range over the whole integration
    from a_early = 1e-20.  XLA:TPU emulates f64 as an f32 pair with f32's
    exponent range, so the raw formulation (state ~ 1/a_early, Og/a^4 ~
    1e80) overflows to inf and crashes the TPU worker.  The a_early scale
    cancels identically downstream (D and dD/da are only consumed
    normalized by the table's own lna=0 row).

        dw/dx = v - w
        dv/dx = -(3 + dlnH/dlna) v + 1.5 Om (f_c + beta) (a / s) w,
            x = ln a,  s = a^4 H^2/H0^2   (bounded; background.py)

    y: [..., 2] — a single k node's state [2] or the whole table's
    [n_lnk+1, 2] (the background scalars and the beta a-gather are shared
    across lanes either way).  beta_col: k-reduced beta values [nz, ...]
    matching y's leading shape."""
    a = jnp.exp(x)
    s = bg.a4H2_H02(c, a, d)
    C0 = 1.5 * c.Omega_m * a / s
    F1 = 3.0 + bg.dlnH_dlna_bounded(c, a, d)
    if beta_a.shape[0] == 0:
        beta = jnp.where(a < 1e-3, f_nu, 0.0)
    else:
        tab = f_nu * beta_raw_at_a(beta_a, beta_col, jnp.minimum(a, 1.0))
        beta = jnp.where(a < 1e-3, f_nu,
                         jnp.where(f_nu < 1e-10, 0.0, tab))
    fc = 1.0 - f_nu
    return jnp.stack([y[..., 1] - y[..., 0],
                      -F1 * y[..., 1] + C0 * (fc + beta) * y[..., 0]],
                     axis=-1)


def _growth_rhs_ramp(c: CosmoParams, d, f_nu, x, y):
    """The growth RHS on the a_early -> min(a_min, 1e-3) ramp, where the
    reference's own clamp fixes Beta == f_nu (a constant):
    `Beta = (a < 1e-3 ? fn : Beta_P(...))`, AU_cosmological_parameters.h:148.
    The ramp ODE is therefore k-INDEPENDENT and is integrated once per
    model on a [2] state instead of once per k node (build_growth_tables).
    """
    a = jnp.exp(x)
    s = bg.a4H2_H02(c, a, d)
    C0 = 1.5 * c.Omega_m * a / s
    F1 = 3.0 + bg.dlnH_dlna_bounded(c, a, d)
    fc = 1.0 - f_nu
    return jnp.stack([y[1] - y[0],
                      -F1 * y[1] + C0 * (fc + f_nu) * y[0]])


def build_growth_tables(cfg: SolverConfig, c: CosmoParams, lin: LinearData):
    """Integrate the growth ODE over all k nodes and tabulate G = D/a and
    dD/da on the (lna, lnk) grid (reference :661-724).

    The reference OpenMP-parallelizes independent per-k integrations
    (:690).  Here the structure is vectorized instead:

    * the a_early -> a_min RAMP (39 node-free e-folds, the dominant
      controller cost) is k-independent — the reference's own clamp fixes
      Beta == f_nu for a < 1e-3 (:148) — so it is integrated ONCE per
      model on a [2] state (8th-order DOP853 by default, the closer
      analog of the reference's rk8pd: 103 attempts vs DOPRI5's 210 at
      equal rtol; probe_growth_flat.py);
    * the TABLE region advances the whole per-k state as ONE
      [n_lnk+1, 2] tensor under a single controller (error norm = max
      over every lane, so each lane is stepped at least as tightly as
      its own controller would demand) — background scalars and the
      beta a-gather are evaluated once per stage for all lanes instead
      of once per lane.  Step count is node-bounded either way (~1
      accepted step per segment); what the shared system removes is the
      n_lnk-fold replication of the transcendental-heavy background.
    * a massless-nu model's ODE has no k dependence at all: one lane is
      integrated and broadcast (exact).

    Per-lane trajectories stay within the controller tolerance band of
    the per-k formulation (the golden and 32-model suites are the
    tripwire); the boundary stage at a == a_min, where the reference's
    strict `a < 1e-3` comparison flips to the per-k table value, perturbs
    the ramp result at one-stage order and decays with the decaying mode
    toward z_in (measured vs the per-k formulation on the bundled
    massive-nu example: normalized-table deviation 2.8e-12 over the
    z <= 5 rows, 7.3e-7 at the a = a_min row; docs/TPU_NOTES.md).
    """
    d = bg.derived(c)
    f_nu = c.Omega_nu / c.Omega_m
    lna_nodes, lnk_nodes = growth_nodes(cfg)
    k_nodes = np.exp(lnk_nodes)

    # beta table reduced at the growth k nodes (clamped to the beta range)
    kq = np.clip(k_nodes, cfg.beta_k_min, cfg.beta_k_max)
    beta_cols = _beta_reduce_k(lin, kq)          # [nz, n_lnk+1]
    beta_a = jnp.asarray(lin.beta_a)

    rtol = cfg.growth_rtol
    x_early = np.log(cfg.a_early)
    x_min = np.log(cfg.growth_a_min)
    # the k-independent stretch ends at the reference's Beta clamp (:148)
    x_share = min(x_min, np.log(1e-3))
    ramp_tab = DOP853 if cfg.growth_ramp_tableau == "dop853" else DOPRI5

    # scaled state (w, v): D(a_early) = 1, dD/da(a_early) = 1/a_early
    # (reference :697) maps to w = v = 1; the reference's h0 = 1e-6 *
    # a_begin (integrate_growth :179) is dx = 1e-6.  Rows store (G, dD/da)
    # up to the common a_early scale, which cancels in growth_D_f's
    # normalization: w == (D/a) * a_early.
    y_r, h_r = integrate_interval(
        lambda x, y: _growth_rhs_ramp(c, d, f_nu, x, y),
        x_early, x_share, jnp.array([1.0, 1.0]), 1e-6, 0.0, rtol, ramp_tab)

    # one lane when the ODE is k-independent (massless nu), else all nodes
    n_lanes = len(k_nodes) if beta_cols.shape[0] else 1
    bc = beta_cols if beta_cols.shape[0] else jnp.zeros((0, n_lanes))

    def rhs(x, y):
        return _growth_rhs(c, d, f_nu, beta_a, bc, x, y)

    y0 = jnp.broadcast_to(y_r, (n_lanes, 2))
    h0 = h_r
    if x_share < x_min:
        # growth_a_min above the clamp: finish the ramp per-k
        y0, h0 = integrate_interval(rhs, x_share, x_min, y0, h0,
                                    0.0, rtol, ramp_tab)
    first = y0

    if cfg.growth_dense and not cfg.growth_h_reset:
        # free stepping over the whole table range with dense output at
        # the lna nodes — step count set by stiffness, not by the 101
        # node stops (measured ~3x fewer controller attempts)
        rows, _, _ = integrate_dense(
            rhs, x_min, float(lna_nodes[-1]), y0, h0, 0.0, rtol,
            jnp.asarray(lna_nodes[1:]), DOPRI5)
        tabs = jnp.concatenate([first[None], rows], axis=0)
    else:
        def seg(carry, xx):
            y, h = carry
            x0, x1 = xx
            # reference resets h0 = 1e-6*a0 per segment (fresh gsl evolve
            # per call); carrying the adaptive step instead saves the
            # re-ramp (~4x fewer steps) with the same trajectory at this
            # tolerance.  The table region stays DOPRI5: its step count is
            # node-bounded, order buys nothing there (TODO.md closed lines).
            hseg = 1e-6 if cfg.growth_h_reset else h
            y2, h2 = integrate_interval(rhs, x0, x1, y, hseg,
                                        0.0, rtol, DOPRI5)
            return (y2, h2), y2

        segs = jnp.stack([jnp.asarray(lna_nodes[:-1]),
                          jnp.asarray(lna_nodes[1:])], axis=1)
        _, rows = jax.lax.scan(seg, (y0, h0), segs)
        tabs = jnp.concatenate([first[None], rows], axis=0)

    G = tabs[:, :, 0]                            # [n_lna+1, n_lanes]
    dDda = tabs[:, :, 1]
    if n_lanes != len(k_nodes):
        G = jnp.broadcast_to(G, (G.shape[0], len(k_nodes)))
        dDda = jnp.broadcast_to(dDda, (dDda.shape[0], len(k_nodes)))
    return lna_nodes, G, dDda


# ---------------------------------------------------------------------------
# linear power spectrum pieces

def _transfer_lnT(c: CosmoParams, lin: LinearData):
    """ln T_cb(ln k) table from the z=0 transfer file (reference :804-816):
    T_cb = f_b_cb*T_b + (1-f_b_cb)*T_c, normalized to the first row."""
    f_b_cb = c.Omega_b / (c.Omega_m - c.Omega_nu)
    T = f_b_cb * lin.t_Tb + (1.0 - f_b_cb) * lin.t_Tc
    return jnp.log(T / T[0])


def transfer_at(c: CosmoParams, lin: LinearData, lnk_query):
    """T_cb at query points (tabulated_function 1-D rules; linear
    extrapolation of ln T beyond both table ends)."""
    lnT = _transfer_lnT(c, lin)
    return jnp.exp(interp.interp1_vec(jnp.asarray(lin.t_lnk), lnT,
                                      jnp.asarray(lnk_query)))


def sigma8_normalization(cfg: SolverConfig, c: CosmoParams, lin: LinearData,
                         beta_quad_a1):
    """Norm = sigma_8^2 / integral (reference :849-875).

    Integrand (reference :204-217): W(kR)^2 T^2 F^2 k^(ns+3) / (2 pi^2) over
    ln kR in [-15, 15], R = 8, F = f_cb + beta_P(a=1, k), with the Taylor-
    switched window below kR = 1e-2.
    """
    nodes, weights = quad_nodes(cfg)
    R = 8.0
    kR = np.exp(nodes)
    k = kR / R
    T = transfer_at(c, lin, jnp.log(jnp.asarray(k)))
    f_nu = c.Omega_nu / c.Omega_m
    F = 1.0 - f_nu + beta_quad_a1
    W = np.where(kR > 1e-2,
                 3.0 * (np.sin(kR) / kR ** 3 - np.cos(kR) / kR ** 2),
                 1.0 - 0.1 * kR * kR)
    integrand = (W * W) * T * T * F * F * k ** (c.n_s + 3.0) / \
        (2.0 * np.pi ** 2)
    integral = jnp.dot(jnp.asarray(weights), integrand)
    return c.sigma_8 ** 2 / integral


def _beta_a1_traced(cfg: SolverConfig, c: CosmoParams, lin: LinearData, k):
    """beta_P(a=1, k) at TRACED k (for adaptive-quadrature integrands);
    same clamps as the static-node path in prepare_model."""
    f_nu = c.Omega_nu / c.Omega_m
    if lin.beta_raw.shape[0] == 0:
        return jnp.zeros_like(k)
    cols = _beta_reduce_k(lin, jnp.clip(k, cfg.beta_k_min, cfg.beta_k_max))
    raw = beta_raw_at_a(jnp.asarray(lin.beta_a), cols, jnp.asarray(1.0))
    return jnp.where(f_nu < 1e-10, 0.0, f_nu * raw)


def sigma8_normalization_qag(cfg: SolverConfig, c: CosmoParams,
                             lin: LinearData):
    """Norm via the GSL-replica adaptive GK61 quadrature — the reference's
    exact discretization (gsl_integration_qag key=6, epsabs 0, epsrel 1e-4
    over ln kR in [-15, 15]; AU_cosmological_parameters.h:849-874)."""
    from redtime_tpu.quadrature import qag_gk61

    f_nu = c.Omega_nu / c.Omega_m
    R = 8.0

    def integrand(lnkR):
        kR = jnp.exp(lnkR)
        k = kR / R
        T = transfer_at(c, lin, jnp.log(k))
        F = 1.0 - f_nu + _beta_a1_traced(cfg, c, lin, k)
        W = jnp.where(kR > 1e-2,
                      3.0 * (jnp.sin(kR) / kR ** 3 - jnp.cos(kR) / kR ** 2),
                      1.0 - 0.1 * kR * kR)
        return (W * W) * T * T * F * F * k ** (c.n_s + 3.0) / \
            (2.0 * jnp.pi ** 2)

    integral, _ = qag_gk61(integrand, cfg.quad_lnk_lo, cfg.quad_lnk_hi,
                           0.0, 1e-4, cfg.qag_limit)
    return c.sigma_8 ** 2 / integral


def sigma_v2_z0_qag(cfg: SolverConfig, c: CosmoParams, lin: LinearData,
                    norm):
    """sigma_v^2(0) via the GSL-replica qag (reference :940-952)."""
    from redtime_tpu.quadrature import qag_gk61

    f_nu = c.Omega_nu / c.Omega_m

    def integrand(lnk):
        k = jnp.exp(lnk)
        T = transfer_at(c, lin, lnk)
        F = 1.0 - f_nu + _beta_a1_traced(cfg, c, lin, k)
        return norm * k ** (c.n_s + 1.0) * T * T * F * F

    integral, _ = qag_gk61(integrand, cfg.quad_lnk_lo, cfg.quad_lnk_hi,
                           0.0, 1e-4, cfg.qag_limit)
    return integral / (6.0 * jnp.pi ** 2)


def sigma_v2_z0(cfg: SolverConfig, c: CosmoParams, lin: LinearData,
                norm, beta_quad_a1_full):
    """sigma_v^2(z=0) = int k P_lin(0,k) dlnk / (6 pi^2) (reference
    :932-962); P_lin(0,k) = Norm k^ns T^2 F^2 since D(0,k) == 1."""
    nodes, weights = quad_nodes(cfg)
    k = np.exp(nodes)
    T = transfer_at(c, lin, jnp.asarray(nodes))
    f_nu = c.Omega_nu / c.Omega_m
    F = 1.0 - f_nu + beta_quad_a1_full
    P = norm * k ** c.n_s * T * T * F * F
    return jnp.dot(jnp.asarray(weights), jnp.asarray(k) * P) / \
        (6.0 * np.pi ** 2)


# ---------------------------------------------------------------------------
# model assembly and evaluation

def prepare_model(cfg: SolverConfig, c: CosmoParams,
                  lin: LinearData, norm_override=None) -> Model:
    """Build all per-cosmology tables.  Jittable (cfg static).

    norm_override: use this P_lin normalization constant instead of the
    sigma_8 integral (reference :849-875).  Injected-linear mode
    (redtime_tpu.inject) reconstructs T_cb only over the solver k-range,
    where the sigma_8 integral's extrapolated tails would bias the
    normalization; the exact constant is known in closed form there.
    """
    grids = make_grids(cfg)

    # growth tables, reduced over k onto the solver grid
    lna_nodes, G, dDda = build_growth_tables(cfg, c, lin)
    W = jnp.asarray(growth_k_reduction(cfg))     # [nk, n_lnk+1]
    G_red = G @ W.T                              # [n_lna+1, nk]
    dDda_red = dDda @ W.T
    # Dnorm: G interpolated at lna = 0 per k column (reference :715-718)
    i0, wx = interp.axis_weights(jnp.asarray(lna_nodes), jnp.asarray(0.0))
    Dnorm = wx @ jax.lax.dynamic_slice(
        G_red, (i0, jnp.zeros_like(i0)), (4, G_red.shape[1]))  # [nk]
    # TPU range guard: the growth table's common scale is arbitrary (only
    # ratios enter growth_D_f).  Early-DE-dominated cosmologies
    # (w0 + wa > 1/3: rho_DE grows faster than radiation toward a -> 0)
    # grow D ~ a^3 from a_early, pushing the stored scale past the f32
    # exponent ceiling of the TPU's emulated f64 (docs/TPU_NOTES.md) —
    # device_put of such a host-prepared table lands as inf and every
    # growth lookup goes NaN.  The SMALL end faults the same way: the
    # v01-compat ramp from a_early=1e-50 leaves the stored scale at
    # ~1e-45, below the f32 NORMAL floor, so device_put flushes the
    # whole table to zero (measured round 4: run_batch with
    # SolverConfig.v01_compat crashed the TPU worker; host leaves g_G /
    # g_Dnorm / g_dDda all ~1e-45).  Rescale by Dnorm when its scale
    # leaves [1e-25, 1e30]; the s == 1 branch leaves physical
    # default/high-accuracy cosmologies bit-identical.
    dmax = jnp.max(jnp.abs(Dnorm))
    s = jnp.where((dmax > 1e30) | (dmax < 1e-25), Dnorm,
                  jnp.ones_like(Dnorm))
    G_red = G_red / s
    dDda_red = dDda_red / s
    Dnorm = Dnorm / s

    # beta table reduced at the solver grid (k clamped to beta range)
    kq = np.clip(grids.k, cfg.beta_k_min, cfg.beta_k_max)
    beta_solver = _beta_reduce_k(lin, kq)        # [nz, nk]

    # transfer at the solver grid
    T_solver = transfer_at(c, lin, jnp.asarray(grids.lnk))

    # sigma_8 normalization and sigma_v^2(0): need beta_P(a=1, k) at the
    # quadrature nodes (two different k mappings)
    nodes, _ = quad_nodes(cfg)
    f_nu = c.Omega_nu / c.Omega_m

    def beta_a1_at(k_query):
        if lin.beta_raw.shape[0] == 0:
            return jnp.zeros(len(k_query))
        cols = _beta_reduce_k(
            lin, np.clip(k_query, cfg.beta_k_min, cfg.beta_k_max))
        raw = beta_raw_at_a(jnp.asarray(lin.beta_a), cols, jnp.asarray(1.0))
        return jnp.where(f_nu < 1e-10, 0.0, f_nu * raw)

    if cfg.quad_impl == "qag":
        if norm_override is None:
            norm = sigma8_normalization_qag(cfg, c, lin)
        else:
            norm = jnp.asarray(norm_override, dtype=jnp.float64)
        sv2 = sigma_v2_z0_qag(cfg, c, lin, norm)
    else:
        beta_q_s8 = beta_a1_at(np.exp(nodes) / 8.0)
        beta_q_sv = beta_a1_at(np.exp(nodes))
        if norm_override is None:
            norm = sigma8_normalization(cfg, c, lin, beta_q_s8)
        else:
            norm = jnp.asarray(norm_override, dtype=jnp.float64)
        sv2 = sigma_v2_z0(cfg, c, lin, norm, beta_q_sv)

    return Model(cosmo=c, g_lna=jnp.asarray(lna_nodes), g_G=G_red,
                 g_dDda=dDda_red, g_Dnorm=Dnorm,
                 beta_a=jnp.asarray(lin.beta_a), beta_solver=beta_solver,
                 T_solver=T_solver, norm=norm, sigmaV2_z0=sv2)


def growth_D_f(model: Model, z):
    """D(z, k) and dD/da(z, k) on the solver grid (reference :727-730)."""
    a = 1.0 / (1.0 + z)
    lna0 = jnp.log(a)
    wx = interp.axis_weights_full(model.g_lna, lna0)
    Gv = wx @ model.g_G
    dDv = wx @ model.g_dDda
    D = Gv * a / model.g_Dnorm
    dDda = dDv / model.g_Dnorm
    return D, dDda


def plin_all(cfg: SolverConfig, model: Model, z):
    """P_lin, P_lin_cb, P_lin_nu on the solver grid at redshift z
    (reference :834-930)."""
    grids = make_grids(cfg)
    c = model.cosmo
    a = 1.0 / (1.0 + z)
    D, _ = growth_D_f(model, z)
    beta = beta_P_solver(model, a)
    f_nu = model.f_nu
    F = 1.0 - f_nu + beta
    k = jnp.asarray(grids.k, dtype=model.T_solver.dtype)
    P = model.norm * k ** c.n_s * model.T_solver ** 2 * F * F * D * D
    massless = f_nu <= 1e-10
    Pcb = jnp.where(massless, P, P / (model.f_cb + beta) ** 2)
    R = beta / (f_nu * F + 1e-300)
    Pnu = jnp.where(massless, 0.0, P * R * R)
    return P, Pcb, Pnu


def comoving_distance_table(cfg: SolverConfig, c: CosmoParams,
                            a_in: float, n: int = 1000):
    """H0*chi(eta) table (reference H0chi_eta_init, :742-784): cumulative
    integral of dz/(H/H0) over a 1000-point log-z grid in [1e-4, 1e4],
    returned as (eta_nodes ascending, H0chi values).

    The reference never calls this from main() (dead API surface, SURVEY
    #9h); provided for API completeness.  Each panel uses fixed
    Gauss-Legendre in place of gsl qag (rel 1e-4).
    """
    zmin, zmax = 1e-4, 1e4
    dlnz = np.log(zmax / zmin) / (n - 1)
    z_nodes = zmin * np.exp(dlnz * np.arange(n))
    edges = np.concatenate([[0.0], z_nodes])
    x, w = np.polynomial.legendre.leggauss(16)
    lo, hi = edges[:-1, None], edges[1:, None]
    zq = 0.5 * (hi - lo) * x[None, :] + 0.5 * (hi + lo)   # [n, 16]
    wq = 0.5 * (hi - lo) * w[None, :]
    integrand = 1.0 / bg.H_H0(c, 1.0 / (1.0 + jnp.asarray(zq)))
    panels = jnp.sum(jnp.asarray(wq) * integrand, axis=1)
    chi = jnp.cumsum(panels)                               # H0chi(z_nodes)
    eta = np.log((1.0 / (1.0 + z_nodes)) / a_in)
    # ascending eta = descending z
    return jnp.asarray(eta[::-1].copy()), chi[::-1]


def h0_chi(cfg: SolverConfig, c: CosmoParams, a_in: float, eta):
    """H0*chi at eta = ln(a/a_in) (reference H0chi, :773-784): returns z
    itself below z=1e-4, table interpolation otherwise.

    SCALAR eta only (interp.interp1 is scalar; vmap for vectors), and the
    1000-node table is rebuilt per call — this mirrors a dead reference
    API (never called from main(), SURVEY section 2 #9h); callers looping
    over eta should build `comoving_distance_table` once themselves."""
    eta_nodes, chi = comoving_distance_table(cfg, c, a_in)
    a = a_in * jnp.exp(jnp.asarray(eta))
    z = 1.0 / a - 1.0
    val = interp.interp1(eta_nodes, chi, jnp.asarray(eta))
    return jnp.where(z <= 1e-4, z, val)


def sigma_v2(model: Model, z, lnk_sv2_weights=None):
    """sigma_v^2(z) = D(z, k=1e-3)^2 * sigma_v^2(0) (reference :963-970).

    The reference HARDCODES kmin_sv2 = 1e-3 independent of the solver
    grid; on the default grid that is the first solver k, so D[0] is
    exact.  For a non-default cfg.kmin, pass `lnk_sv2_weights` — the
    static interpolation row over the solver lnk columns at ln(1e-3)
    (driver builds it via interp.weight_row_np) — or D[0] is used with
    the grid's own first point (documented deviation)."""
    D, _ = growth_D_f(model, z)
    Dv = D[0] if lnk_sv2_weights is None else lnk_sv2_weights @ D
    return Dv * Dv * model.sigmaV2_z0
