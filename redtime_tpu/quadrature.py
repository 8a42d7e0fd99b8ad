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
