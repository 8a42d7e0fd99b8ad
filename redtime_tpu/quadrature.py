"""Direct Gauss-Legendre quadrature of the continuum mode-coupling
integrals — an independent cross-check of the FFT-log engine.

The FAST-PT J transforms (fastpt.py; reference `src/redTime.cc:514-597`)
are a discretized evaluation of the McEwen-Fang-Hirata-Blazek
(arXiv:1603.04826) convolution integrals

    J_{alpha,beta,ell}(k) = 1/(4 pi^2) * int_0^inf q^3 dln q
                            int_{-1}^{1} dx  (q/k)^alpha (s/k)^beta
                            P_ell(mu) P(q) P(s),

with s = |k - q| = sqrt(k^2 + q^2 - 2 k q x) and
mu = qhat . shat = (k x - q)/s the cosine between the two loop momenta.
This module evaluates those integrals DIRECTLY by fixed-order
Gauss-Legendre panels over (ln q, x) — no FFTs, no discrete grid
conventions — realizing the "north-star quadrature" cross-check of
SURVEY section 7.6(b) for the transforms where the naive integral is
well defined.

Scope (verified numerically, tests/test_quadrature.py):
  * the six UNREGULARIZED J families (alpha, -alpha, ell) in
    {(0,0,0), (1,-1,1), (0,0,2), (2,-2,2), (1,-1,3), (0,0,4)} agree
    with the engine to ~2e-3 of the family peak at default resolution
    (the residual is GL resolution of the weak x->1 endpoint
    singularity for beta=-2 plus the FFT-log discretization itself);
  * family 1 (ell=0, alpha=+/-2) is REGULARIZED in FAST-PT (the Jreg
    path, reference `redTime.cc:411-511`): its UV-divergent part is
    moved into the Z-kernel / PZ terms, so only the J+PZ assembly sum
    is physical — the naive integral here intentionally differs;
  * the Jn0 (beta=+2) RSD transforms carry their own DC regularization
    (g zeroed at m=0, `fastpt.py g_dispatch`) and window-dominated UV
    weight; they are validated through the golden suite instead.

This is a validation tool (numpy, CPU): it certifies that the engine
approximates the true continuum integrals independently of the
reference's discretization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from numpy.polynomial.legendre import leggauss

from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids

# the unregularized J families: (family index in fastpt, alpha, beta, ell)
UNREG_FAMILIES = ((0, 0, 0, 0), (2, 1, -1, 1), (3, 0, 0, 2),
                  (4, 2, -2, 2), (5, 1, -1, 3), (6, 0, 0, 4))


def _legendre(ell: int, x: np.ndarray) -> np.ndarray:
    if ell == 0:
        return np.ones_like(x)
    pkm, pk = np.ones_like(x), x
    for n in range(2, ell + 1):
        pkm, pk = pk, ((2 * n - 1) * x * pk - (n - 1) * pkm) / n
    return pk


def _p_interp(cfg: SolverConfig, P_ext: np.ndarray):
    """(lo, hi, P_of): the support bounds in ln k and the masked
    log-log-linear interpolant of the windowed extended spectrum — the
    same input the FFT-log engine consumes, zero outside its support."""
    g = make_grids(cfg)
    P_ext = np.asarray(P_ext, np.float64)
    sup = P_ext > 0.0
    lnk_ext = g.lnk_ext
    lo, hi = lnk_ext[sup][0], lnk_ext[sup][-1]
    lnP = np.where(sup, np.log(np.maximum(P_ext, 1e-300)), -700.0)

    def P_of(q):
        lq = np.log(np.maximum(q, 1e-300))
        v = np.interp(lq, lnk_ext, lnP)
        return np.where((lq < lo) | (lq > hi), 0.0, np.exp(v))

    return lo, hi, P_of


def _gl_lnq(lo: float, hi: float, n_q: int):
    """Gauss-Legendre nodes/weights mapped onto ln q in [lo, hi]."""
    uq, wq = leggauss(n_q)
    lq = 0.5 * (hi + lo) + 0.5 * (hi - lo) * uq
    return lq, 0.5 * (hi - lo) * wq


def j_quadrature(cfg: SolverConfig, P_ext: np.ndarray, k: np.ndarray,
                 alpha: int, beta: int, ell: int,
                 n_q: int = 400, n_x: int = 64) -> np.ndarray:
    """J_{alpha,beta,ell}(k) by 2D Gauss-Legendre quadrature.

    P_ext: the windowed power spectrum on the extended grid [npts]
    (fastpt.extend_power output row).  k: solver-grid values to
    evaluate at.  Returns [len(k)].
    """
    lo, hi, P_of = _p_interp(cfg, P_ext)
    lq, wlq = _gl_lnq(lo, hi, n_q)
    q = np.exp(lq)
    ux, wx = leggauss(n_x)

    k = np.atleast_1d(np.asarray(k, np.float64))[:, None, None]
    qb = q[None, :, None]
    xb = ux[None, None, :]
    s = np.sqrt(np.maximum(k * k + qb * qb - 2.0 * k * qb * xb, 1e-300))
    mu = (k * xb - qb) / s
    f = ((qb / k) ** alpha * (s / k) ** beta * _legendre(ell, mu)
         * P_of(qb) * P_of(s))
    val = np.einsum("i,j,kij->k", wlq * q ** 3, wx, f) / (4.0 * np.pi ** 2)
    return val


def pz_quadrature(cfg: SolverConfig, P_ext: np.ndarray, k: np.ndarray,
                  n: int, n_q: int = 2000) -> np.ndarray:
    """The Z-kernel spectra by direct 1D quadrature.

    The engine's PZ Toeplitz contraction (`fastpt._pz_windowed`;
    reference brute-force convolution `redTime.cc:689-727`) discretizes

        PZ_n(k) = 1/(2 pi^2) * int dln q  q^3 Z_n(q/k) P(q),

    which the assembly pairs with the P_b(k) outer factor.  This
    evaluates the integral with Gauss-Legendre panels and the exact
    Taylor-switched Z_n kernels (`fastpt._z_reg`) — no Toeplitz grid.
    Returns [len(k)] (WITHOUT the P_b(k) outer factor).
    """
    from redtime_tpu import fastpt

    lo, hi, P_of = _p_interp(cfg, P_ext)
    lq, wlq = _gl_lnq(lo, hi, n_q)
    q = np.exp(lq)
    Pq = P_of(q)

    k = np.atleast_1d(np.asarray(k, np.float64))
    out = np.empty(len(k))
    for i, kv in enumerate(k):
        Z = np.array([fastpt._z_reg(n, float(r), cfg.z_taylor_eps,
                                    cfg.z_taylor_terms) for r in q / kv])
        out[i] = np.sum(wlq * q ** 3 * Z * Pq) / (2.0 * np.pi ** 2)
    return out


def jreg_ir_counterterm(cfg: SolverConfig, P_ext: np.ndarray,
                        k: np.ndarray) -> np.ndarray:
    """The piece the FAST-PT regularization removes from J_{2,-2,0}.

    The naive (alpha, beta, ell) = (2, -2, 0) mode-coupling integral
    contains an IR s -> 0 contribution — the integrand approaches
    (k/s)^2 P(k) P(s), whose angular integral collapses to

        Delta(k) = k^2 P(k) / (2 pi^2) * int_0^inf dq P(q).

    The engine's regularized transform (fastpt Jreg path; reference
    `src/redTime.cc:411-511`, the MFHB 1603.04826 (2,-2,0) special case)
    EXCLUDES this piece:  J_naive = J_reg + Delta.  Verified empirically
    to 1e-3 of Delta over the mid-k decade (tests/test_quadrature.py::
    test_jreg_regularization_identity).  Needed to build the continuum
    counterpart of any assembled quantity that reads the regularized
    family (the A_{acd,bef} slots, reference `redTime.cc:813-966`).
    Returns Delta(k) [len(k)] for the windowed spectrum P_ext.
    """
    lo, hi, P_of = _p_interp(cfg, P_ext)
    lq, wlq = _gl_lnq(lo, hi, 4000)
    q = np.exp(lq)
    i_p = np.sum(wlq * q * P_of(q))           # int P(q) dq
    k = np.atleast_1d(np.asarray(k, np.float64))
    g = make_grids(cfg)
    pk = np.exp(np.interp(np.log(k), g.lnk_ext,
                          np.log(np.maximum(np.asarray(P_ext), 1e-300))))
    return k * k * pk * i_p / (2.0 * np.pi ** 2)


# ---------------------------------------------------------------------------
# GSL-replica adaptive Gauss-Kronrod quadrature (jittable)

def qk61(f, a, b):
    """One 61-point Gauss-Kronrod application on [a, b] with QUADPACK's
    error estimate (the rule GSL's qag uses at key=6;
    quadpack dqk61 / gsl qk61.c semantics):

        resk   = Kronrod result, resg = embedded Gauss-30 result
        resasc = int |f - resk/(b-a)|  (Kronrod-weighted)
        err    = |resk - resg| -> resasc * min(1, (200 err / resasc)^1.5)
        err    = max(50 eps * resabs, err)   (roundoff floor)

    f must accept a [61] array.  Returns (result, abserr, resabs, resasc).
    Traceable; nodes/weights derived from first principles in
    redtime_tpu/_gk61.py (scripts/gen_gk61.py)."""
    from redtime_tpu._gk61 import WG30, WGK61, XGK61

    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    c = 0.5 * (a + b)
    h = 0.5 * (b - a)
    fv = f(c + h * jnp.asarray(XGK61))
    resk = jnp.asarray(WGK61) @ fv
    resg = jnp.asarray(WG30) @ fv[1::2]
    resabs = jnp.asarray(WGK61) @ jnp.abs(fv)
    reskh = 0.5 * resk
    resasc = jnp.asarray(WGK61) @ jnp.abs(fv - reskh)
    ah = jnp.abs(h)
    result = resk * h
    resabs = resabs * ah
    resasc = resasc * ah
    err = jnp.abs((resk - resg) * h)
    scaled = resasc * jnp.minimum(
        1.0, (200.0 * err / jnp.maximum(resasc, 1e-300)) ** 1.5)
    err = jnp.where((resasc != 0.0) & (err != 0.0), scaled, err)
    eps50 = 50.0 * np.finfo(np.float64).eps
    err = jnp.where(resabs > np.finfo(np.float64).tiny / eps50,
                    jnp.maximum(eps50 * resabs, err), err)
    return result, err, resabs, resasc


def qag_gk61(f, a, b, epsabs: float = 0.0, epsrel: float = 1e-4,
             limit: int = 1000):
    """Adaptive quadrature replicating gsl_integration_qag(key=6)
    (QUADPACK dqage): apply GK61, then repeatedly bisect the interval
    with the largest error estimate until

        sum_i abserr_i <= max(epsabs, epsrel * |sum_i result_i|).

    GSL keeps the left half in the bisected interval's workspace slot and
    appends the right half; the returned result is the slot-order sum —
    reproduced here so the discretization (and its fp summation order)
    matches the reference's normalization integrals
    (`AU_cosmological_parameters.h:849-874,940-952`, ws_size 1000,
    epsabs 0, epsrel 1e-4).  One fixed-size lax.while_loop; f must accept
    a 1-D array.  On hitting `limit` the result is POISONED with NaN
    (GSL's default error handler aborts the process there).

    Returns (result, abserr)."""
    r0, e0, _, _ = qk61(f, a, b)
    A = jnp.zeros(limit, jnp.float64).at[0].set(a)
    B = jnp.zeros(limit, jnp.float64).at[0].set(b)
    R = jnp.zeros(limit, jnp.float64).at[0].set(r0)
    E = jnp.zeros(limit, jnp.float64).at[0].set(e0)

    def errbnd(R):
        return jnp.maximum(epsabs, epsrel * jnp.abs(jnp.sum(R)))

    def cond(st):
        A, B, R, E, n = st
        return (jnp.sum(E) > errbnd(R)) & (n < limit)

    def body(st):
        A, B, R, E, n = st
        i = jnp.argmax(E)
        ai, bi = A[i], B[i]
        m = 0.5 * (ai + bi)
        # one batched f evaluation for both halves
        from redtime_tpu._gk61 import WG30, WGK61, XGK61
        c1, h1 = 0.5 * (ai + m), 0.5 * (m - ai)
        c2, h2 = 0.5 * (m + bi), 0.5 * (bi - m)
        xs = jnp.stack([c1 + h1 * jnp.asarray(XGK61),
                        c2 + h2 * jnp.asarray(XGK61)])
        fv = f(xs.reshape(-1)).reshape(2, -1)        # [2, 61]; f takes 1-D
        wgk, wg = jnp.asarray(WGK61), jnp.asarray(WG30)
        hh = jnp.stack([h1, h2])
        resk = fv @ wgk
        resg = fv[:, 1::2] @ wg
        resabs = jnp.abs(fv) @ wgk * jnp.abs(hh)
        resasc = jnp.abs(fv - 0.5 * resk[:, None]) @ wgk * jnp.abs(hh)
        res = resk * hh
        err = jnp.abs((resk - resg) * hh)
        scaled = resasc * jnp.minimum(
            1.0, (200.0 * err / jnp.maximum(resasc, 1e-300)) ** 1.5)
        err = jnp.where((resasc != 0.0) & (err != 0.0), scaled, err)
        eps50 = 50.0 * np.finfo(np.float64).eps
        err = jnp.where(resabs > np.finfo(np.float64).tiny / eps50,
                        jnp.maximum(eps50 * resabs, err), err)
        A = A.at[i].set(ai).at[n].set(m)
        B = B.at[i].set(m).at[n].set(bi)
        R = R.at[i].set(res[0]).at[n].set(res[1])
        E = E.at[i].set(err[0]).at[n].set(err[1])
        return A, B, R, E, n + 1

    A, B, R, E, n = jax.lax.while_loop(cond, body, (A, B, R, E,
                                                    jnp.asarray(1)))
    done = jnp.sum(E) <= errbnd(R)
    return jnp.where(done, jnp.sum(R), jnp.nan), jnp.sum(E)
