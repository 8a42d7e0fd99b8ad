"""FAST-PT mode-coupling engine (McEwen, Fang, Hirata, Blazek 1603.04826).

Computes the J_{alpha,beta,ell} FFT-log transforms and the regularized
Z-kernel convolutions PZ_n that feed the Time-RG A/R/PT/PMR assemblies.
Semantics follow the reference engine (`src/redTime.cc:300-811`) exactly —
including its quirks (phase-dropped DC coefficient, redTime.cc:547; the
regularized J_{2,-2,0} branch, :411-511; window application on Fourier
coefficients, :532-536) — but the computation is reorganized TPU-first:

  * the 63+63 per-transform OpenMP loop (:783-811) becomes ONE batched
    pipeline over a [14-family, 3-spectrum] axis of split re/im half-spectra
    (complex dtypes don't exist on TPU);
  * the gamma-function coefficient arrays g/f depend only on grid geometry
    (integers + dlnk), so they are precomputed once per config on the host
    (scipy loggamma) and baked in as constants;
  * the 21 brute-force O((4 np)^2) Z convolutions (:396-408, :715) become a
    static Toeplitz contraction `einsum(T[7, np, np], P_ext[3, np])` — a
    batched matmul on the MXU, mathematically identical to the reference's
    linear convolution restricted to the needed output window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import loggamma

from redtime_tpu import fourier
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids, pab_extension_matrix

# transform-family tables (reference redTime.cc:731-738)
ELL_N = (0, 0, 1, 2, 2, 3, 4)
ALPHA_N = (0, 2, 1, 0, 2, 1, 0)
ELLN0_N = (0, 2, 4, 0, 2, 4, 6)
ALPHAN0_N = (0, 0, 0, 2, 2, 2, 2)
Z_N = (0, 1, -1, 3, -3, 5, -5)
NFAM_J = 7      # families 0..6: J_{alpha,-alpha,ell}; family 1 regularized
NFAM = 14       # families 7..13: Jn0_{alpha,2,ell} (RSD path)


# ---------------------------------------------------------------------------
# gamma-function coefficients (host, numpy/scipy)

def _g_raw(mu: float, re_kappa: float, im_kappa: float):
    """|g| and arg(g) of Gamma((mu+kappa+1)/2) / Gamma((mu-kappa+1)/2)
    (reference g_MFHB, redTime.cc:306-319).  Phases only enter through
    cos/sin, so branch conventions don't matter."""
    top = loggamma(complex(0.5 * (mu + re_kappa + 1.0), 0.5 * im_kappa))
    bot = loggamma(complex(0.5 * (mu - re_kappa + 1.0), -0.5 * im_kappa))
    return float(np.exp(top.real - bot.real)), float(top.imag - bot.imag)


def _f_raw(re_rho: float, im_rho: float):
    """f_MFHB (reference redTime.cc:321-328)."""
    g0, g1 = _g_raw(0.5, re_rho - 0.5, im_rho)
    pre = 0.5 * np.sqrt(np.pi) * 2.0 ** re_rho
    return pre * g0, im_rho * np.log(2.0) + g1


class FastPTCoeffs(NamedTuple):
    """Static per-config coefficient pack (numpy; constants under jit)."""

    ga_re: np.ndarray     # [14, np/2]
    ga_im: np.ndarray
    gb_re: np.ndarray
    gb_im: np.ndarray
    fh_re: np.ndarray     # [14, np+1]
    fh_im: np.ndarray
    prek: np.ndarray      # [14, np]
    kbias: np.ndarray     # [np]  k^{-nu} on the extended grid
    toeplitz: np.ndarray  # [7, np, np]  Z-kernel convolution matrices
    pz_kfac: np.ndarray   # [np]  dlnk/(2 pi^2) * k^3


def _z_reg(n: int, r: float, eps: float, terms: int) -> float:
    """Regularized Z kernels Z_n(r), n in {0,+-1,+-3,+-5} with the Taylor
    switches of the reference (redTime.cc:599-687)."""
    if n < 0:
        return _z_reg(-n, 1.0 / r, eps, terms)
    if n == 0:
        return 1.0
    lnkq = np.log(abs((1.0 + r) / (1.0 - r))) if r != 1.0 else 0.0
    Z = 0.0
    if n == 1:
        if r < eps:
            for m in range(terms):
                Z += 2.0 * r ** (2 * m + 1) * (1.0 - r) / (2 * m + 1)
        elif r > 1.0 / eps:
            for m in range(terms):
                Z += 2.0 * r ** (-2 * m - 1) * (1.0 - r) / (2 * m + 1)
        elif r == 1.0:
            Z = 0.0
        else:
            Z = (1.0 - r) * lnkq
    elif n == 3:
        if r < eps:
            Z = r * r
            for m in range(terms):
                Z += (1.0 - r ** 3) * r ** (2 * m + 1) / (2 * m + 1)
        elif r > 1.0 / eps:
            for m in range(terms):
                Z += r ** (-2 * m) * ((2 * m + 3) / r - 2 * m - 1) / \
                    ((2 * m + 1) * (2 * m + 3))
        elif r == 1.0:
            Z = 1.0
        else:
            Z = r ** 2 + 0.5 * (1.0 - r ** 3) * lnkq
    elif n == 5:
        if r < eps:
            Z = r ** 4 + r ** 2 / 3.0
            for m in range(terms):
                Z += (1.0 - r ** 5) * r ** (2 * m + 1) / (2 * m + 1)
        elif r > 1.0 / eps:
            for m in range(terms):
                Z += r ** (-2 * m) * ((2 * m + 5) / r - 2 * m - 1) / \
                    ((2 * m + 1) * (2 * m + 5))
        elif r == 1.0:
            Z = 4.0 / 3.0
        else:
            Z = r ** 4 + r ** 2 / 3.0 + 0.5 * (1.0 - r ** 5) * lnkq
    else:  # n in {2, 4} defined by the reference but unused by Z_N
        raise ValueError(f"Z kernel n={n} not required")
    return Z


@functools.lru_cache(maxsize=4)
def fastpt_coeffs(cfg: SolverConfig) -> FastPTCoeffs:
    g = make_grids(cfg)
    npts, dlnk, nu = g.npts, g.dlnk, cfg.nu_bias
    nu_int = int(round(nu))
    half = npts // 2
    ln2 = np.log(2.0)

    def tau(idx: int) -> float:
        return 2.0 * np.pi * idx / (dlnk * npts)

    def g_dispatch(ell: int, alpha: int, m: int):
        """g_MFHB frontend (reference redTime.cc:344-355)."""
        if m == 0 and alpha == ell - nu_int:
            return 0.0, 0.0
        if alpha == -2 and ell == 0:
            return _f_raw(nu, tau(m))      # g_reg (reference :338-342)
        return _g_raw(0.5 + ell, 1.5 + nu + alpha, tau(m))

    ga = np.zeros((NFAM, half), dtype=np.complex128)
    gb = np.zeros((NFAM, half), dtype=np.complex128)
    fh = np.zeros((NFAM, npts + 1), dtype=np.complex128)
    prek = np.zeros((NFAM, npts))

    for fam in range(NFAM):
        if fam < NFAM_J:
            ell, alpha = ELL_N[fam], ALPHA_N[fam]
            beta = -alpha
        else:
            n = fam - NFAM_J
            ell, alpha, beta = ELLN0_N[n], ALPHAN0_N[n], 2
        reg = (ell == 0 and alpha == 2 and beta == -2)
        sl = 1.0 if ell % 2 == 0 else -1.0
        expo = 3.0 + 2.0 * nu + alpha + beta

        if not reg:
            for m in range(half):
                g0a, g1a = g_dispatch(ell, alpha, m)
                g0b, g1b = g_dispatch(ell, beta, m)
                if m == 0:
                    # DC quirk: cga[0] = ca[0]*|g| (phase dropped,
                    # reference redTime.cc:547)
                    ga[fam, 0] = g0a
                    gb[fam, 0] = g0b
                else:
                    ga[fam, m] = g0a * np.exp(1j * g1a)
                    gb[fam, m] = g0b * np.exp(1j * g1b)
            for h in range(npts + 1):
                f0, f1 = _f_raw(-4.0 - 2.0 * nu - (alpha + beta), -tau(h))
                ph = f1 + ln2 * tau(h)
                if h == 0:
                    fh[fam, h] = f0 * np.cos(f1)     # reference :568
                elif h == npts:
                    fh[fam, h] = f0 * np.cos(ph)     # Nyquist slot is real
                else:
                    fh[fam, h] = f0 * np.exp(1j * ph)
            prek[fam] = sl * (2.0 * g.k_ext) ** expo / \
                (2.0 * np.pi ** 2 * npts ** 2)
        else:
            # regularized J_{2,-2,0} (reference Jreg_MFHB, :411-511):
            # the 2^{1.5+nu+alpha} magnitude and ln2*tau phase sit on the
            # a-side coefficients; the b-side uses g_reg; no tau phase after
            # the convolution; Nyquist phase forced to zero.
            for m in range(half):
                if m > 0:
                    g0, g1 = _g_raw(0.5 + ell, 1.5 + nu + alpha, tau(m))
                    g0 *= 2.0 ** (1.5 + nu + alpha)
                    g1 += ln2 * tau(m)
                    ga[fam, m] = g0 * np.exp(1j * g1)
                # m == 0: g zeroed (alpha == ell - nu_int), stays 0
                g0b, g1b = _f_raw(nu, tau(m))
                if m == 0:
                    # keep the real part only (the ~1e-16 sin(pi) leak the
                    # C++ carries is below any tolerance here)
                    gb[fam, 0] = g0b * np.cos(g1b)
                else:
                    gb[fam, m] = g0b * np.exp(1j * g1b)
            for h in range(npts + 1):
                f0, f1 = _f_raw(-4.0 - 2.0 * nu - (alpha + beta), -tau(h))
                if h == 0:
                    fh[fam, h] = f0 * np.cos(f1)
                elif h == npts:
                    fh[fam, h] = f0        # reference :493-494 (ACf = 0)
                else:
                    fh[fam, h] = f0 * np.exp(1j * f1)
            prek[fam] = sl * np.sqrt(2.0 / np.pi) * g.k_ext ** expo / \
                (2.0 * np.pi ** 2 * npts ** 2)

    # Z-kernel Toeplitz matrices: T_n[i, m] = G_n[np + i - m] where
    # G_n[j] = Z_n(r_j) r_j^3, r_j = exp(-dlnk (j - np))  (reference
    # PZ_reg, :689-727; brute-force convolution :396-408 restricted to the
    # outputs actually read)
    Gn = np.zeros((NFAM_J, 2 * npts))
    for fi, n in enumerate(Z_N):
        for j in range(2 * npts):
            r = np.exp(-dlnk * (j - npts)) if j != npts else 1.0
            Gn[fi, j] = _z_reg(n, r, cfg.z_taylor_eps,
                               cfg.z_taylor_terms) * r ** 3
    i_idx = np.arange(npts)[:, None]
    m_idx = np.arange(npts)[None, :]
    toeplitz = Gn[:, npts + i_idx - m_idx]          # [7, np, np]

    return FastPTCoeffs(
        ga_re=ga.real, ga_im=ga.imag, gb_re=gb.real, gb_im=gb.imag,
        fh_re=fh.real, fh_im=fh.imag, prek=prek,
        kbias=np.exp(-nu * g.lnk_ext),
        toeplitz=toeplitz,
        pz_kfac=dlnk / (2.0 * np.pi ** 2) * g.k_ext ** 3)


@functools.lru_cache(maxsize=4)
def _pab_ext(cfg: SolverConfig):
    return pab_extension_matrix(make_grids(cfg))


class EngineConsts(NamedTuple):
    """All static engine arrays as a pytree, so driver code passes them as
    jit ARGUMENTS.  Baked-in f64 constants of this size (~85 MB: DFT
    matrices + Toeplitz pack) multiply TPU remote-compile time by ~7x per
    engine instance in the graph."""

    ga_re: jnp.ndarray
    ga_im: jnp.ndarray
    gb_re: jnp.ndarray
    gb_im: jnp.ndarray
    fh_re: jnp.ndarray
    fh_im: jnp.ndarray
    prek: jnp.ndarray
    kbias: jnp.ndarray
    toeplitz: jnp.ndarray
    pz_kfac: jnp.ndarray
    wp: jnp.ndarray
    wc: jnp.ndarray
    pab_M: jnp.ndarray      # [npts, nk] Pab extension matrix (transposed use)
    pab_v: jnp.ndarray
    dft_np: object          # DFTConsts or None (fft mode)
    dft_2np: object


def engine_consts(cfg: SolverConfig, mode: str = "auto") -> EngineConsts:
    """Build the engine constant pack (host -> device arrays, once).

    With cfg.engine_transform_dtype == 'float32', the transform-path
    arrays (DFT matrices, Toeplitz pack, gamma coefficients, windows) are
    stored in f32: the engine then runs its matmuls in true-f32 (6-pass
    bf16 on the MXU) regardless of the state dtype, and compute_J_PZ
    casts its outputs back.  The Pab extension stays f64 (it feeds the
    log-spectrum extrapolation)."""
    g = make_grids(cfg)
    co = fastpt_coeffs(cfg)
    M, v = _pab_ext(cfg)
    use_matmul = fourier._resolve(mode) == "matmul"
    tdt = (jnp.float32 if cfg.engine_transform_dtype == "float32"
           else jnp.float64)
    t = lambda x: jnp.asarray(x, dtype=tdt)
    return EngineConsts(
        ga_re=t(co.ga_re), ga_im=t(co.ga_im),
        gb_re=t(co.gb_re), gb_im=t(co.gb_im),
        fh_re=t(co.fh_re), fh_im=t(co.fh_im),
        prek=t(co.prek), kbias=t(co.kbias),
        toeplitz=t(co.toeplitz), pz_kfac=t(co.pz_kfac),
        wp=jnp.asarray(g.wp), wc=t(g.wc),
        pab_M=jnp.asarray(M), pab_v=jnp.asarray(v),
        dft_np=fourier.dft_consts(g.npts, tdt) if use_matmul else None,
        dft_2np=fourier.dft_consts(2 * g.npts, tdt) if use_matmul else None)


def extend_power(cfg: SolverConfig, lnP3: jnp.ndarray, n_s,
                 ec: EngineConsts | None = None) -> jnp.ndarray:
    """ln P [3, nk] -> windowed P on the extended grid [3, np] (reference
    redTime.cc:771-778: Pab extrapolation times the WP window)."""
    if ec is None:
        g = make_grids(cfg)
        M, v = _pab_ext(cfg)
        M, v, wp = jnp.asarray(M), jnp.asarray(v), jnp.asarray(g.wp)
    else:
        M, v, wp = ec.pab_M, ec.pab_v, ec.wp
    with jax.default_matmul_precision("highest"):
        lnP_ext = lnP3 @ M.T + (n_s - 3.0) * v
    return jnp.exp(lnP_ext) * wp


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def compute_J_PZ(cfg: SolverConfig, P_ext: jnp.ndarray, with_rsd: bool,
                 mode: str = "auto", ec: EngineConsts | None = None):
    """The batched FFT-log engine.

    P_ext: windowed spectra on the extended grid [3, np] (from extend_power;
    rows are P_00, P_01, P_11).

    Returns (J, PZ):
      J  [nfam, 3, 3, np] — families 0..6 are the reference's J[63]
         (J[9n+3a+b] == J[n, a, b]); families 7..13 are Jn0 (only when
         with_rsd).
      PZ [7, 3, 3, np]    — the reference's PZ[63] layout.
    """
    g = make_grids(cfg)
    if ec is None:
        ec = engine_consts(cfg, mode)
    npts, half = g.npts, g.npts // 2
    nfam = NFAM if with_rsd else NFAM_J

    # In f32 (TPU throughput) mode the DFT/Toeplitz matmuls MUST run at
    # full f32 precision: the TPU's DEFAULT matmul precision is one bf16
    # pass (~1e-3 relative), which lands ABOVE the eta controller's error
    # tolerance — the stepper then rejects nearly every step (measured:
    # 1831 attempts/segment vs 20 at proper precision).  "highest" costs
    # 6 bf16 passes and restores f32-accurate transforms.
    with jax.default_matmul_precision("highest"):
        return _compute_J_PZ_body(cfg, P_ext, with_rsd, mode, ec, g, npts,
                                  half, nfam)


def _compute_J_PZ_body(cfg, P_ext, with_rsd, mode, ec, g, npts, half, nfam):
    # run the transform pipeline in the engine-consts dtype (f32 when
    # cfg.engine_transform_dtype == 'float32'); outputs cast back at exit
    out_dt = P_ext.dtype
    P_ext = P_ext.astype(ec.kbias.dtype)

    # biased, coefficient-windowed forward transform of the three spectra
    re, im = fourier.rfft(P_ext * ec.kbias, mode, ec.dft_np)
    re, im = re * ec.wc, im * ec.wc
    ca_re, ca_im = re[:, :half], im[:, :half]       # freqs [0, np/2)

    # per-family coefficient products, embedded in a length-(2np)
    # half-spectrum (zero-padded: linear convolution)
    def coeff_spectra(gr, gi):
        sr, si = _cmul(ca_re[None], ca_im[None],
                       gr[:nfam, None], gi[:nfam, None])   # [nfam, 3, half]
        pad = jnp.zeros(sr.shape[:-1] + (npts + 1 - half,), sr.dtype)
        return (jnp.concatenate([sr, pad], -1),
                jnp.concatenate([si, pad], -1))

    sa_re, sa_im = coeff_spectra(ec.ga_re, ec.ga_im)
    sb_re, sb_im = coeff_spectra(ec.gb_re, ec.gb_im)

    # spectral convolution C_h = sum_{m+n=h} (c g^a)_m (c g^b)_n over all
    # 3x3 spectrum pairs (reference iconvolve/cconvolve step)
    n2 = 2 * npts
    ta = fourier.hc_backward(sa_re, sa_im, n2, mode, ec.dft_2np)
    tb = fourier.hc_backward(sb_re, sb_im, n2, mode, ec.dft_2np)
    prod = ta[:, :, None, :] * tb[:, None, :, :] / n2  # [nfam, 3, 3, 2np]
    c_re, c_im = fourier.rfft(prod, mode, ec.dft_2np)  # [nfam, 3, 3, np+1]

    # multiply by f (and tau phase, baked into fh), back-transform, sample
    # the even points (the reference's stride-2 read, redTime.cc:507,593)
    cf_re, cf_im = _cmul(c_re, c_im,
                         ec.fh_re[:nfam, None, None],
                         ec.fh_im[:nfam, None, None])
    t = fourier.hc_backward(cf_re, cf_im, n2, mode, ec.dft_2np)
    J = t[..., ::2] * ec.prek[:nfam, None, None, :]

    if not with_rsd:
        J = jnp.concatenate(
            [J, jnp.zeros((NFAM - NFAM_J,) + J.shape[1:], J.dtype)], axis=0)

    # PZ: Toeplitz contraction + pointwise k^3 P_b factor (reference PZ_reg
    # output line :720-724 with the icd!=0 ratio construction :797-800)
    conv = jnp.einsum("nim,am->nai", ec.toeplitz, P_ext)
    PZ = ec.pz_kfac * conv[:, :, None, :] * P_ext[None, None]

    return J.astype(out_dt), PZ.astype(out_dt)
