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
from redtime_tpu.ode import (DOP853, DOPRI5, RKF45, integrate_interval,
                             rk_step)

NUP, NUI, NELL, NUQ = 3, 14, 3, 24
NU_STATE = NUP + NUI + NUQ  # 41

# Finite-range guards for the TPU's emulated f64 (f32 EXPONENT range,
# docs/TPU_NOTES.md): an adaptive TRIAL step can overshoot lnP far beyond
# any physical value; exp() of such a state is inf on TPU, and an inf
# inside the solve while_loop can crash the worker outright (the
# growth-ODE precedent in TPU_NOTES).  The caps are ~7 e-folds outside
# any physical trajectory (lnP peaks ~13 at sigma_8~1.1, lnP11 bottoms
# ~-55 under the reference's own ±10 rate clamp), so accepted steps are
# bit-identical; only rejected-trial garbage is tamed.  LNP_MAX keeps
# the engine's quadratic P-products and their 4np-term convolution sums
# below f32's ~3.4e38 ceiling; LNP_MIN keeps exp() above underflow so
# dP/P stays finite.  DLNP_GUARD bounds the un-clamped dlnP rows (the
# reference clamps only row 11, :1487-1491): at erel=1e-2 no step with
# |dlnP|~1e4 is ever accepted, so the guard binds only inside rejected
# trials.  (The round-2 "batch>32" device fault itself turned out to be
# the growth-table scale overflow fixed in model.prepare_model — these
# guards close the remaining trial-state exp() routes to inf.)
LNP_MIN, LNP_MAX = -80.0, 20.0
DLNP_GUARD = 1e4

# fz exponents of the 1-loop rescale (reference :1322-1336)
_BEF_POW = np.array([(j % 8) // 4 + ((j % 8) % 4) // 2 + (j % 8) % 2 + 1
                     for j in range(64)])
_ABC_POW = np.array([(j // 4) + (j % 4) // 2 + (j % 2) + 1 for j in range(8)])


def _pow_onehot(idx: np.ndarray) -> np.ndarray:
    """One-hot row selector S so that S @ fpow == fpow[idx]: static
    fancy indexing lowers through XLA's gather, which is pathological on
    the TPU runtime (docs/TPU_NOTES.md); the matmul form is
    element-traffic bound."""
    S = np.zeros((len(idx), 4))
    S[np.arange(len(idx)), idx] = 1.0
    return S


_BEF_SEL = _pow_onehot(_BEF_POW - 1)     # [64, 4]
_ABC_SEL = _pow_onehot(_ABC_POW - 1)     # [8, 4]


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
    if fastpt._asm_leg_resolved(cfg) == "matmul":
        if with_rsd and ec is not None and ec.asm_C is not None:
            consts = (ec.asm_C, ec.asm_kw, ec.asm_S)
        else:
            # non-rsd path: the reduced row pack (R/PT rows dropped);
            # small enough (~0.2 MB) to bake as constants
            consts = tuple(jnp.asarray(x)
                           for x in fastpt._asm_consts_np(cfg, with_rsd))
        return assembly.assemble_matmul(Jw[:7], PZw, Jw[7:], J_lo, k,
                                        with_rsd, *consts)
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
    dt = fpow.dtype
    A64 = pre * (jnp.asarray(_BEF_SEL, dt) @ fpow) * cache.A64
    R = pre * (jnp.asarray(_ABC_SEL, dt) @ fpow)[None] * cache.R
    PT = pre * (jnp.asarray(_pow_onehot(3 - np.asarray(assembly.M_N)), dt)
                @ fpow) * cache.PT
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

        lnP = jnp.clip(y[0:3], LNP_MIN, LNP_MAX)     # TPU finite-range guard
        P = jnp.exp(lnP)                             # P00, P01, P11

        if nonlinear:
            # Omega contractions as ONE bilinear-form matmul per state
            # block: the six-axis [2,...,2,nk] einsum formulation lowers
            # to tiny-tile code on TPU (~25x, docs/TPU_NOTES.md), and
            # even the stacked one-hot product-sum pays 4 dots + a
            # 6-block reduce per eval; CI/CQ contract the outer product
            # (Of x I) in a single flat dot.  The matrices fold in the
            # symmetry scatter and the unique-row selection, so the
            # 64-slot array is never materialized.
            CI, CQ = (jnp.asarray(m, dtype=jdt)
                      for m in assembly.OMEGA_BILINEAR)
            TR14 = jnp.asarray(assembly.OMEGA_MATS[2], dtype=jdt)
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
        # rejected-trial finite-range guard (binds only at |dlnP| far
        # beyond any acceptable step; see DLNP_GUARD note above)
        dlnP = jnp.clip(dlnP, -DLNP_GUARD, DLNP_GUARD)
        # late-time P_11 -> 0 instability clamp (reference :1487-1491)
        dlnP = dlnP.at[2].set(jnp.clip(dlnP[2], -10.0, 10.0))

        if not nonlinear:
            return jnp.concatenate(
                [dlnP, jnp.zeros((NUI + NUQ, nk), dtype=jdt)]).reshape(-1)

        # --- dI (reference :1500-1513): the three Omega x I index
        # contractions, restricted to the 14 unique rows — one bilinear
        # dot against the (Of x I14) outer product
        OI = (Of[:, None, :] * I14[None, :, :]).reshape(4 * NUI, nk)
        t = CI @ OI
        dI = 2.0 * e_eta * A_u - t

        # --- dQ (reference :1516-1539)
        if evolve_q:
            Q24 = y[NUP + NUI:]
            OQ = (Of[:, None, :] * Q24[None, :, :]).reshape(4 * NUQ, nk)
            qt = CQ @ OQ
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


def eta_tableau(cfg: SolverConfig):
    """The embedded RK pair for the eta evolution.  'rkf45' is the
    reference's integrator (gsl rkf45, redTime.cc:1593) and the parity
    default; 'dop853' is the tight-tolerance throughput option (at the
    HIGH_ACCURACY tolerances the 8th-order pair takes several-fold
    fewer steps over the same converged trajectory)."""
    return {"rkf45": RKF45, "dopri5": DOPRI5,
            "dop853": DOP853}[cfg.eta_tableau]


def _cast_stepping(cfg: SolverConfig, model, cache, ec):
    """float32 throughput mode: cast the stepping inputs (see evolve)."""
    jdt = cfg.jdtype
    cast = lambda x: (x.astype(jdt)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating) else x)
    model = jax.tree_util.tree_map(cast, model)
    cache = jax.tree_util.tree_map(cast, cache)
    if ec is not None:
        ec = jax.tree_util.tree_map(cast, ec)
    return model, cache, ec


def evolve_init(cfg: SolverConfig, settings: RunSettings,
                model: mdl.Model):
    """Initial (y, h) carry for the segmented-dispatch path — exactly the
    state `evolve` hands its segment scan (y in the stepping dtype, h the
    reference's 1e-2*eta_fin suggestion as an f64 scalar)."""
    y = initial_state(cfg, settings, model)
    if cfg.dtype != "float64":
        y = y.astype(cfg.jdtype)
    eta_fin = float(np.log(1.0 / settings.a_in))
    return y, jnp.asarray(1e-2 * eta_fin)


def evolve_segment(cfg: SolverConfig, settings: RunSettings,
                   model: mdl.Model, y, h, t0, t1,
                   mode: str = "auto", ec=None):
    """One output-interval integrate — the body of `evolve`'s segment scan
    as a standalone jittable (t0/t1 traced, so ONE compiled program serves
    every interval).

    The driver's segmented scheduler dispatches this once per interval:
    on the axon TPU tunnel a single device program running longer than
    ~60-100 s faults the worker (measured round 5, docs/TPU_NOTES.md
    "dispatch-duration wall"), which caps the one-program chunked solve
    at chunk 32 for nk=512.  Per-interval programs queue back-to-back
    asynchronously and stay under the wall while the chunk size keeps
    amortizing the shared Ozaki packs.

    In 1-loop mode the A/R/PT cache is rebuilt inside each interval
    program (one extra engine evaluation per interval — negligible next
    to the stepping cost, and the cache is a pure function of the model).
    """
    cache = (build_oneloop_cache(cfg, settings, model, mode, ec)
             if settings.nonlinear and settings.one_loop else None)
    if cfg.dtype != "float64":
        model, cache, ec = _cast_stepping(cfg, model, cache, ec)
    rhs = make_rhs(cfg, settings, model, cache, mode, ec)
    return integrate_interval(rhs, t0, t1, y, h, cfg.eabs_P, cfg.erel_P,
                              eta_tableau(cfg))


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
        model, cache, ec = _cast_stepping(cfg, model, cache, ec)
        y = y.astype(cfg.jdtype)
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
                                    cfg.eabs_P, cfg.erel_P,
                                    eta_tableau(cfg))
        return (y2, h2), y2

    segs = jnp.stack([jnp.asarray(t0s), jnp.asarray(etasteps)], axis=1)
    _, outs = jax.lax.scan(seg, (y, jnp.asarray(h)), segs)
    return outs.reshape(len(etasteps), NU_STATE, g.nk), cache


def evolve_packed(cfg: SolverConfig, settings: RunSettings, models,
                  n_lanes: int = 8, mode: str = "auto", ec=None,
                  max_iters: int = 1_000_000, return_iters: bool = False):
    """Work-queue batched evolution (the TPU batch scheduler).

    A plain vmapped adaptive solve steps all lanes in segment lockstep and
    pays max-over-lanes step attempts per segment (~15% above the
    per-model mean on homogeneous batches, potentially much more when
    stiffness varies across the batch; the reference's serial shell loop,
    scripts/runRedTimeBatch:91-99, has no such waste).  Here each of
    `n_lanes` lanes advances its OWN controller
    trajectory; when a lane passes its last output segment it flushes its
    outputs and pulls the next cosmology off the queue inside a
    scalar-predicated lax.cond, so model-table gathers are paid ~N times
    total, not per iteration.  Per-model trajectories apply the same
    controller arithmetic in the same order as trg.evolve (reference
    integrator redTime.cc:1589-1630); results agree with the chunked
    scheduler within the controller's own tolerance band (~1e-6 on the
    output table — XLA reduction order differs between batch lowerings,
    and the adaptive controller amplifies ulp-level RHS differences into
    slightly different step sequences, exactly as rebatching does).

    models: stacked prepared-Model pytree [N, ...].
    Returns ys [N, S, NU_STATE, nk] (S = number of output redshifts).
    """
    g = make_grids(cfg)
    nk = g.nk
    jdt = cfg.jdtype
    N = int(jax.tree_util.tree_leaves(models)[0].shape[0])
    L = min(n_lanes, N)
    S = len(settings.z_out)
    etasteps = jnp.asarray(settings.etasteps())
    eta_fin = float(np.log(1.0 / settings.a_in))
    h_init = jnp.float64(1e-2 * eta_fin)
    tab = eta_tableau(cfg)
    nflat = NU_STATE * nk
    one_loop = settings.nonlinear and settings.one_loop
    if one_loop:
        # per-model z1l mode-coupling caches, built vmapped up front from
        # the f64 models (mirrors trg.evolve: the cache math stays f64;
        # only the stepping below may run f32) and gathered per lane on
        # reload like the models themselves
        caches = jax.vmap(
            lambda mm: build_oneloop_cache(cfg, settings, mm, mode, ec)
        )(models)
    if cfg.dtype != "float64":
        # f32 stepping mode: cast the model/engine tables like
        # trg.evolve does, or the RHS returns f64 and the while_loop
        # carry dtype diverges from its f32 initial value at trace time
        cast = lambda x: (x.astype(jdt)
                          if hasattr(x, "dtype")
                          and jnp.issubdtype(x.dtype, jnp.floating) else x)
        models = jax.tree_util.tree_map(cast, models)
        if one_loop:
            caches = jax.tree_util.tree_map(cast, caches)
        if ec is not None:
            ec = jax.tree_util.tree_map(cast, ec)
    # the lane work unit: model (+ its 1-loop cache) — one pytree so the
    # queue reload gathers both with the same one-hot contraction
    work = (models, caches) if one_loop else (models,)

    def lane_attempt(mw, t, h, y, t1):
        """One controller attempt — the body of ode.integrate_interval
        verbatim, with the lane's own segment target t1."""
        m = mw[0]
        cache = mw[1] if one_loop else None
        rhs = make_rhs(cfg, settings, m, cache, mode, ec)
        dt = t1 - t
        # >= : when h lands EXACTLY on the remaining interval the step
        # must count as final, or the next attempt runs with h_try = 0
        # and h_next = 0 * fac permanently zeroes the lane
        # (integrate_interval is immune — its cond exits on t >= t1)
        final = h >= dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr = rk_step(rhs, t, h_try, y, tab)
        d0 = cfg.eabs_P + cfg.erel_P * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)
        dec = r > 1.1
        ord_ = tab.order
        fac_dec = jnp.maximum(0.9 * r ** (-1.0 / ord_), 0.2)
        fac_inc = jnp.clip(0.9 * r ** (-1.0 / (ord_ + 1.0)), 1.0, 5.0)
        fac = jnp.where(dec, fac_dec, jnp.where(r < 0.5, fac_inc, 1.0))
        h_next = h_try * fac
        t_out = jnp.where(dec, t, jnp.where(final, t1, t + h_try))
        y_out = jnp.where(dec, y, y_new)
        return t_out, y_out, h_next, final & ~dec

    # all initial states once, OUTSIDE the loop (a trivially parallel
    # vmap); reloads then only gather rows instead of re-running the
    # P_lin/growth interpolation chain per reload event
    y0_all = jax.vmap(
        lambda mm: initial_state(cfg, settings, mm))(models)
    y0_all = y0_all.reshape(N, nflat)

    def load_states_onehot(idx, take):
        """Select work units/initial states for lanes via one-hot einsum
        contractions — XLA's f64 gather lowers pathologically on the
        current TPU runtime (docs/TPU_NOTES.md), a matmul-style masked
        contraction is element-traffic bound instead.  Lanes with
        take=False receive zeros (discarded by the caller's select)."""
        oh = ((idx[:, None] == jnp.arange(N)[None, :])
              & take[:, None]).astype(jnp.float64)

        def pick(x):
            if jnp.issubdtype(x.dtype, jnp.inexact):
                flat = x.reshape(N, -1).astype(jnp.float64)
                return (oh @ flat).astype(x.dtype).reshape((L,)
                                                           + x.shape[1:])
            return jnp.take(x, jnp.where(take, idx, 0), axis=0)

        gm = jax.tree_util.tree_map(pick, work)
        return gm, (oh @ y0_all).astype(y0_all.dtype)

    def lane_select(take):
        def sel(a, b):
            return jnp.where(take.reshape((take.shape[0],)
                                          + (1,) * (a.ndim - 1)), a, b)
        return sel

    def reload(args):
        m, t, h, y, seg, midx, outloc, active, counter, outg = args
        finished = (seg >= S) & active
        # flush finished lanes into the global output (one-hot contraction
        # instead of an f64 scatter — pathological on this runtime)
        ohn = ((midx[None, :] == jnp.arange(N)[:, None])
               & finished[None, :])
        contrib = jnp.einsum("nl,lso->nso", ohn.astype(outg.dtype),
                             outloc)
        outg = jnp.where(ohn.any(axis=1)[:, None, None], contrib, outg)
        # pull next models off the queue (distinct index per lane)
        order = jnp.cumsum(finished.astype(jnp.int32)) - 1
        nmidx = counter + order
        has = nmidx < N
        take = finished & has
        gm, y0 = load_states_onehot(jnp.where(take, nmidx, 0), take)
        sel = lane_select(take)
        m = jax.tree_util.tree_map(sel, gm, m)
        y = jnp.where(take[:, None], y0.astype(y.dtype), y)
        t = jnp.where(take, 0.0, t)
        h = jnp.where(take, h_init, h)
        seg = jnp.where(take, 0, seg)
        midx = jnp.where(take, nmidx, midx)
        active = active & ~(finished & ~has)
        counter = counter + finished.sum(dtype=jnp.int32)
        return m, t, h, y, seg, midx, outloc, active, counter, outg

    def body(carry):
        (m, t, h, y, seg, midx, outloc, active, counter, outg, it) = carry
        t1 = etasteps[jnp.minimum(seg, S - 1)]
        tn, yn, hn, reached = jax.vmap(lane_attempt)(m, t, h, y, t1)
        t = jnp.where(active, tn, t)
        h = jnp.where(active, hn, h)
        y = jnp.where(active[:, None], yn, y)
        reached = reached & active
        # record the segment output lane-locally (masked select, no
        # scatter); flushed to the global buffer on model completion
        oh = ((jnp.arange(S)[None, :] == seg[:, None])
              & reached[:, None])
        outloc = jnp.where(oh[..., None], y[:, None, :], outloc)
        seg = seg + reached.astype(seg.dtype)
        st = (m, t, h, y, seg, midx, outloc, active, counter, outg)
        st = jax.lax.cond(jnp.any((seg >= S) & active), reload,
                          lambda a: a, st)
        return st + (it + 1,)

    def cond(carry):
        active, it = carry[7], carry[10]
        return jnp.any(active) & (it < max_iters)

    m0 = jax.tree_util.tree_map(lambda x: x[:L], work)
    y0 = y0_all[:L]
    carry0 = (m0,
              jnp.zeros(L, jnp.float64),
              jnp.full(L, h_init),
              y0.astype(jdt),
              jnp.zeros(L, jnp.int32),
              jnp.arange(L, dtype=jnp.int32),
              jnp.zeros((L, S, nflat), jdt),
              jnp.ones(L, bool),
              jnp.asarray(L, jnp.int32),
              jnp.zeros((N, S, nflat), jdt),
              jnp.asarray(0, jnp.int32))
    fin = jax.lax.while_loop(cond, body, carry0)
    out = fin[9].reshape(N, S, NU_STATE, nk)
    if return_iters:
        return out, fin[10]
    return out


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
