"""Time-RG evolution: state layout, the RHS, and the eta integration.

State tensor y [nU=41, nk] (reference redTime.cc:150, 1418-1423):
  rows 0..2   : ln P_00, ln P_01, ln P_11
  rows 3..16  : the 14 unique I_{acd,bef} components (JU order)
  rows 17..40 : 24 Q^ell_{abc} components, ell-major then (4a+2b+c)

The RHS (reference derivatives(), :1416-1547) is evaluated as whole-grid
tensor algebra: the per-k OpenMP loop becomes einsum contractions of the
full I/Q tensors against the 2x2(xk) Omega matrix, and the mode-coupling
A/R/PT sources come either from the 1-loop cache rescaled by growth factors
(:1287-1340) or from the full FAST-PT engine (:740-1282).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from redtime_tpu import assembly, fastpt
from redtime_tpu import background as bg
from redtime_tpu import model as mdl
from redtime_tpu.config import RunSettings, SolverConfig
from redtime_tpu.grids import make_grids
from redtime_tpu.ode import RKF45, integrate_interval

NUP, NUI, NELL, NUQ = 3, 14, 3, 24
NU_STATE = NUP + NUI + NUQ  # 41

# fz exponents of the 1-loop rescale (reference :1322-1336)
_BEF_POW = np.array([(j % 8) // 4 + ((j % 8) % 4) // 2 + (j % 8) % 2 + 1
                     for j in range(64)])
_ABC_POW = np.array([(j // 4) + (j % 4) // 2 + (j % 2) + 1 for j in range(8)])


class OneLoopCache(NamedTuple):
    """Mode-coupling evaluated once at z1l from the linear spectrum
    (reference :1291-1313)."""

    A64: jnp.ndarray     # [64, nk]
    R: jnp.ndarray       # [3, 8, nk]
    PT: jnp.ndarray      # [9, nk]
    PMR: jnp.ndarray     # [8, nk]
    D_z1l: jnp.ndarray   # [nk]


def omega_matrix(cfg: SolverConfig, model: mdl.Model, a):
    """Omega(a, k) [2, 2, nk] (reference :1383-1411)."""
    g = make_grids(cfg)
    c = model.cosmo
    d = bg.derived(c)
    beta = mdl.beta_P_solver(model, a)
    nk = g.nk
    dt = model.T_solver.dtype
    o00 = jnp.ones(nk, dtype=dt)
    o01 = -jnp.ones(nk, dtype=dt)
    o10 = -1.5 * c.Omega_m * (model.f_cb + beta) / \
        (a ** 3 * bg.H2_H02(c, a, d))
    o11 = (3.0 + bg.dlnH_dlna(c, a, d)) * jnp.ones(nk, dtype=dt)
    return jnp.stack([jnp.stack([o00, o01]), jnp.stack([o10, o11])])


def compute_mode_coupling_full(cfg: SolverConfig, lnP3, n_s, with_rsd: bool,
                               k, mode: str = "auto", ec=None):
    """Full FAST-PT evaluation from the current spectra; returns
    (A_unique [14, nk], R [3,8,nk], PT [9,nk], PMR [8,nk])."""
    P_ext = fastpt.extend_power(cfg, lnP3, n_s, ec)
    Jw, J_lo, PZw = fastpt.compute_J_PZ_windowed(cfg, P_ext, with_rsd,
                                                 mode, ec)
    return assembly.assemble(Jw[:7], PZw, Jw[7:], J_lo, k, with_rsd)


def build_oneloop_cache(cfg: SolverConfig, settings: RunSettings,
                        model: mdl.Model, mode: str = "auto",
                        ec=None) -> OneLoopCache:
    """Evaluate the mode coupling at z1l from the LINEAR cb spectrum
    (reference :1295-1313: all three rows are ln P_lin_cb, no f factors)."""
    g = make_grids(cfg)
    _, Pcb, _ = mdl.plin_all(cfg, model, cfg.z1l)
    lnP3 = jnp.broadcast_to(jnp.log(Pcb), (3, g.nk))
    engine_rsd = settings.print_rsd or cfg.print_q  # Q evolution needs R
    A_u, R, PT, PMR = compute_mode_coupling_full(
        cfg, lnP3, model.cosmo.n_s, engine_rsd,
        jnp.asarray(g.k, dtype=cfg.jdtype), mode, ec)
    D_z1l, _ = mdl.growth_D_f(model, cfg.z1l)
    return OneLoopCache(assembly.expand64(A_u), R, PT, PMR, D_z1l)


def oneloop_rescale(cfg: SolverConfig, settings: RunSettings,
                    model: mdl.Model, cache: OneLoopCache, eta):
    """Rescale the z1l mode coupling to eta (reference :1316-1337).

    All exponents are small integers, so powers are multiply chains — f64
    `pow` is emulated (slowly, ~1e-9 accurately) on TPU and this sits in
    the RHS hot loop."""
    z = jnp.exp(-eta) * (1.0 + settings.z_in) - 1.0
    D, dDda = mdl.growth_D_f(model, z)
    fz = dDda / (D * (1.0 + z))
    dr = D / cache.D_z1l
    dr2 = dr * dr
    pre = dr2 * dr2 * jnp.exp(-4.0 * eta)                # [nk]

    f2 = fz * fz
    fpow = jnp.stack([fz, f2, f2 * fz, f2 * f2])         # fz^{1..4} [4, nk]
    A64 = pre * fpow[jnp.asarray(_BEF_POW) - 1] * cache.A64
    R = pre * fpow[jnp.asarray(_ABC_POW) - 1][None] * cache.R
    PT = pre * fpow[3 - jnp.asarray(assembly.M_N)] * cache.PT
    PMR = pre * cache.PMR
    return A64, R, PT, PMR


def _collapse_pt(PT):
    """PTjm [9, nk] -> PT2/4/6/8 [4, nk] (reference :1353-1357)."""
    return jnp.stack([PT[0] + PT[1] + PT[2], PT[3] + PT[4] + PT[5],
                      PT[6] + PT[7], PT[8]])


def make_rhs(cfg: SolverConfig, settings: RunSettings, model: mdl.Model,
             cache: OneLoopCache | None, mode: str = "auto", ec=None):
    """Build the flattened-state RHS dy/deta (reference derivatives())."""
    g = make_grids(cfg)
    nk = g.nk
    jdt = cfg.jdtype
    k = jnp.asarray(g.k, dtype=jdt)
    a_in = settings.a_in
    evolve_q = settings.print_rsd or cfg.print_q
    nonlinear = settings.nonlinear

    def rhs(eta, yflat):
        eta = jnp.asarray(eta, dtype=jdt)   # integrator time stays f64
        y = yflat.reshape(NU_STATE, nk)
        a = a_in * jnp.exp(eta)
        O = omega_matrix(cfg, model, a)              # [2, 2, nk]
        e_eta = jnp.exp(eta)

        lnP = y[0:3]
        P = jnp.exp(lnP)                             # P00, P01, P11

        if nonlinear:
            # Omega contractions as stacked one-hot matmuls on flat
            # [rows, nk] arrays: the six-axis [2,...,2,nk] einsum
            # formulation lowers to tiny-tile code on TPU and costs ~25x
            # more (docs/TPU_NOTES.md); the matrices fold in the
            # symmetry scatter and the unique-row selection, so the
            # 64-slot array is never materialized.
            PI, QI, TR14, PQm, QQm = (
                jnp.asarray(m, dtype=jdt) for m in assembly.OMEGA_MATS)
            I14 = y[NUP:NUP + NUI]
            if settings.one_loop:
                A64, R, _, _ = oneloop_rescale(cfg, settings, model, cache,
                                               eta)
                A_u = jnp.asarray(assembly.UNIQ_SEL, dtype=jdt) @ A64
            else:
                A_u, R, _, _ = compute_mode_coupling_full(
                    cfg, lnP, model.cosmo.n_s, evolve_q, k, mode,
                    ec)
            Of = O.reshape(4, nk)                    # rows: O[i, g] at 2i+g

        # --- d ln P (reference :1449-1491)
        # dP_ab = -Omega_ac P_cb - Omega_bc P_ac  (P indexed P[0]=P00,
        # P[1]=P01, P[2]=P11)
        dP0 = -2.0 * (O[0, 0] * P[0] + O[0, 1] * P[1])
        dP1 = -(O[0, 0] * P[1] + O[0, 1] * P[2]) - \
            (O[1, 0] * P[0] + O[1, 1] * P[1])
        dP2 = -2.0 * (O[1, 0] * P[1] + O[1, 1] * P[2])
        if nonlinear:
            # I-coupling: sum_{c,d} I_{acd,bcd} + I_{bcd,acd}
            Isum = (TR14 @ I14).reshape(2, 2, nk)
            coef = e_eta * 4.0 * np.pi / k
            dP0 = dP0 + coef * (Isum[0, 0] + Isum[0, 0])
            dP1 = dP1 + coef * (Isum[1, 0] + Isum[0, 1])
            dP2 = dP2 + coef * (Isum[1, 1] + Isum[1, 1])
        dlnP = jnp.stack([dP0 / P[0], dP1 / P[1], dP2 / P[2]])
        # late-time P_11 -> 0 instability clamp (reference :1487-1491)
        dlnP = dlnP.at[2].set(jnp.clip(dlnP[2], -10.0, 10.0))

        if not nonlinear:
            return jnp.concatenate(
                [dlnP, jnp.zeros((NUI + NUQ, nk), dtype=jdt)]).reshape(-1)

        # --- dI (reference :1500-1513): the three Omega x I index
        # contractions, restricted to the 14 unique rows
        t = ((QI @ Of) * (PI @ I14)).reshape(6, NUI, nk).sum(axis=0)
        dI = 2.0 * e_eta * A_u - t

        # --- dQ (reference :1516-1539)
        if evolve_q:
            Q24 = y[NUP + NUI:]
            qt = ((QQm @ Of) * (PQm @ Q24)).reshape(6, NUQ, nk).sum(axis=0)
            dQ = 2.0 * e_eta * R.reshape(NUQ, nk) - qt
        else:
            dQ = jnp.zeros((NUQ, nk), dtype=jdt)

        return jnp.concatenate([dlnP, dI, dQ]).reshape(-1)

    return rhs


def initial_state(cfg: SolverConfig, settings: RunSettings,
                  model: mdl.Model) -> jnp.ndarray:
    """y(eta=0) (reference :1570-1586): lnP rows from P_lin_cb(z_in) with
    growth-rate f factors; I and Q start at zero."""
    g = make_grids(cfg)
    D, dDda = mdl.growth_D_f(model, settings.z_in)
    f_in = settings.a_in * dDda / D
    _, Pcb, _ = mdl.plin_all(cfg, model, settings.z_in)
    lnP = jnp.stack([jnp.log(Pcb), jnp.log(Pcb * f_in),
                     jnp.log(Pcb * f_in * f_in)])
    return jnp.concatenate(
        [lnP, jnp.zeros((NUI + NUQ, g.nk), dtype=cfg.jdtype)]).reshape(-1)


def evolve(cfg: SolverConfig, settings: RunSettings, model: mdl.Model,
           mode: str = "auto", ec=None):
    """Integrate the Time-RG system through all output redshifts.

    Returns (ys [n_eta, 41, nk], cache) where ys[i] is the state at output
    i.  Mirrors the reference main loop (:1589-1630): RKF45 with
    control_y_new(eabs_P, erel_P), initial step 1e-2*(eta_fin - eta_in),
    step-size suggestion carried across output boundaries.
    """
    g = make_grids(cfg)
    cache = (build_oneloop_cache(cfg, settings, model, mode, ec)
             if settings.nonlinear and settings.one_loop else None)

    y = initial_state(cfg, settings, model)
    if cfg.dtype != "float64":
        # float32 throughput mode: the cache/outputs stay f64-accurate
        # (the FAST-PT assemblies carry strong cancellations); only the
        # time stepping — the dominant cost — runs in f32
        jdt = cfg.jdtype
        cast = lambda x: (x.astype(jdt)
                          if hasattr(x, "dtype")
                          and jnp.issubdtype(x.dtype, jnp.floating) else x)
        model = jax.tree_util.tree_map(cast, model)
        cache = jax.tree_util.tree_map(cast, cache)
        if ec is not None:
            ec = jax.tree_util.tree_map(cast, ec)
        y = y.astype(jdt)
    rhs = make_rhs(cfg, settings, model, cache, mode, ec)
    eta_fin = float(np.log(1.0 / settings.a_in))
    h = 1e-2 * eta_fin
    etasteps = np.asarray(settings.etasteps())
    t0s = np.concatenate([[0.0], etasteps[:-1]])

    # one scanned interval integrator: the RHS/while_loop graph is traced
    # once, not once per output redshift (compile-size critical on TPU)
    def seg(carry, t0t1):
        y, h = carry
        y2, h2 = integrate_interval(rhs, t0t1[0], t0t1[1], y, h,
                                    cfg.eabs_P, cfg.erel_P, RKF45)
        return (y2, h2), y2

    segs = jnp.stack([jnp.asarray(t0s), jnp.asarray(etasteps)], axis=1)
    _, outs = jax.lax.scan(seg, (y, jnp.asarray(h)), segs)
    return outs.reshape(len(etasteps), NU_STATE, g.nk), cache


def pbis_j(cfg: SolverConfig, ys: jnp.ndarray):
    """A(k, mu) columns from the evolved Q (reference Pbisj, :265-298).

    ys: [41, nk] state at one output.  Returns [5, nk]: the (j_mu, m_b)
    combos (2,2), (2,1), (4,1), (4,0), (6,0)."""
    g = make_grids(cfg)
    k = jnp.asarray(g.k, dtype=ys.dtype)
    Q = ys[NUP + NUI:].reshape(NELL, 2, 2, 2, g.nk)

    p22 = -2.0 * Q[0, 0, 1, 0] + (4.0 / 3.0) * Q[1, 0, 1, 0]
    p21 = (4.0 / 3.0) * Q[1, 0, 1, 1] + (6.0 / 5.0) * Q[2, 0, 1, 1]
    p41 = (-2.0 * Q[0, 1, 1, 0] + (4.0 / 3.0) * Q[1, 1, 1, 0]
           - 2.0 * Q[0, 0, 1, 1] - 2.0 * Q[2, 0, 1, 1])
    p40 = (4.0 / 3.0) * Q[1, 1, 1, 1] + (6.0 / 5.0) * Q[2, 1, 1, 1]
    p60 = -2.0 * Q[0, 1, 1, 1] - 2.0 * Q[2, 1, 1, 1]
    return np.pi * k * jnp.stack([p22, p21, p41, p40, p60])
