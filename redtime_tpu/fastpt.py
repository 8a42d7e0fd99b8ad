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

from redtime_tpu import dd, fourier
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


@functools.lru_cache(maxsize=8)
def _dft_out_consts(n: int, dtype):
    """Backward-DFT matrices restricted to the even sample points (the
    reference's stride-2 read, redTime.cc:507,593): [n//2+1, n//2]."""
    _, _, bc, bs = fourier._dft_matrices(n)
    return (jnp.asarray(bc[:, ::2], dtype=dtype),
            jnp.asarray(bs[:, ::2], dtype=dtype))


def _out_columns(g) -> np.ndarray:
    """Extended-grid columns the assembly actually reads: the solver
    window [nshift, nshift+nk) plus the PMR low-k index (reference
    :1252)."""
    nlo = g.nshift - g.nk // 2
    return np.concatenate([np.arange(g.nshift, g.nshift + g.nk), [nlo]])


@functools.lru_cache(maxsize=8)
def _restricted_out_consts(cfg: SolverConfig):
    """Output-leg matrices restricted to the _out_columns.

    The J pipeline's tail is rfft(prod) -> complex fh multiply ->
    even-sample backward DFT read at the solver window.  Keeping the
    per-family fh multiply elementwise, the two transforms are SHARED
    flat dots:  c = prod @ [FC | -FS], then t = [cf_re | cf_im] @
    [Bc_o ; Bs_o] with the backward matrices' columns restricted to the
    nk+1 read positions (~4x fewer MACs than the full-grid backward, and
    no batched-dim dot).  Returns numpy f64 (fwd [2np, 2(np+1)],
    bwd [2(np+1), nk+1])."""
    g = make_grids(cfg)
    n2 = 2 * g.npts
    fc, fs, bc, bs = fourier._dft_matrices(n2)
    cols = _out_columns(g)
    fwd = np.concatenate([fc, -fs], axis=1)        # [2np, 2(np+1)]
    bwd = np.concatenate([bc[:, ::2][:, cols],
                          bs[:, ::2][:, cols]], axis=0)
    return fwd, bwd


def _oz_q(K: int) -> int:
    """Ozaki bits-per-slice for contraction length K: slice products are
    integers < 2^(2q) and their K-term sums < 2^(2q + log2 K) must stay
    exactly representable in the MXU's f32 accumulator (24-bit)."""
    return (24 - int(np.ceil(np.log2(K)))) // 2


def _oz_sa(q: int) -> int:
    """Activation slice count: cover the full f64 mantissa plus guard
    bits.  The composite dot concentrates the whole output leg's
    cancellation in one contraction (the RSD-family J's cancel ~1e4 of
    the slice-product scale), so truncating the activation at ~42 bits
    costs ~1e-7 relative there; full coverage keeps the windowed J within
    ~1e-11 of the f64 path at ~15% more MXU work."""
    return -(-56 // q)


def _oz_pairs(sa: int, sb: int, cut: int) -> int:
    return sum(len([i for i in range(sa) if 0 <= d - i < sb])
               for d in range(cut + 1))


def _leg_cut(full: int, q: int, oz_bits: int, extra: int) -> int:
    """Diagonal cut for a pack: `full` is the leg's full-coverage cut;
    with cfg.oz_bits > 0, truncate to ~(oz_bits + extra) mantissa bits
    of the balanced matrix (extra = the leg's measured cancellation
    guard).  Dropped diagonals weigh <= 2^-(q*(cut+2)) of the balanced
    operand scale; the consumers iterate `enumerate(pack)` so they
    adapt to any cut without code changes."""
    if oz_bits <= 0:
        return full
    return max(1, min(full, -(-(oz_bits + extra) // q) - 1))


def _oz_leg_bytes(cfg: SolverConfig) -> dict:
    """Per-leg int8 diagonal-pack sizes in bytes.  The packs scale as
    (pair count) x NFAM x 2np x (nk+1) for the out leg plus
    (pair count) x np x 2np for the tab leg and (pair count) x np x 7nk
    for the PZ leg — ~100 MB total at nk=128, ~2.6 GB at nk=512
    (HIGH_ACCURACY).  'fwd' covers both the Pab-extension and forward-
    transform packs (they are built together)."""
    K = 2 * cfg.npts
    q = min(_oz_q(K), 7)
    sa, sb = -(-56 // q), -(-53 // q)
    bits = cfg.oz_bits
    cut_out = _leg_cut(max(sa, sb) - 1, q, bits, OZ_EXTRA_OUT)
    out_b = _oz_pairs(sa, sb, cut_out) * NFAM * K * (cfg.nk + 1)
    qt = min(_oz_q(cfg.npts), 7)
    sat = _oz_sa(qt)
    sbt = -(-53 // qt)
    tab_b = _oz_pairs(sat, sbt, _leg_cut(sat - 2, qt, bits, 0)) \
        * cfg.npts * K
    pz_b = _oz_pairs(sat, sbt,
                     _leg_cut(max(sat, sbt) - 1, qt, bits, OZ_EXTRA_PZ)) \
        * cfg.npts * NFAM_J * cfg.nk
    qe = min(_oz_q(cfg.nk), 7)
    ext_b = _oz_pairs(_oz_sa(qe), -(-53 // qe),
                      _leg_cut(max(_oz_sa(qe), -(-53 // qe)) - 1,
                               qe, bits, 0)) \
        * cfg.nk * cfg.npts
    fwd_b = _oz_pairs(sat, sbt,
                      _leg_cut(max(sat, sbt) - 1, qt, bits, 0)) \
        * cfg.npts * cfg.npts
    return {"out": out_b, "tab": tab_b, "pz": pz_b, "fwd": ext_b + fwd_b}


def _oz_enabled(cfg: SolverConfig) -> frozenset:
    """Which Ozaki const packs to build, chosen PER LEG under the HBM
    budget (cfg.oz_budget_bytes; 0 = auto) instead of all-or-nothing:
    legs explicitly set to 'ozaki' are always built (the user asked);
    'auto' legs are added greedily in measured-benefit order
    (out > tab > pz > fwd, the round-2 throughput progression in
    docs/TPU_NOTES.md) while they fit.  At nk=512 the default budget
    admits every leg (~2.6 GB of int8 on a 16 GB v5e)."""
    legs = _oz_leg_bytes(cfg)
    knobs = {"out": cfg.out_leg, "tab": cfg.tab_leg,
             "pz": cfg.pz_leg, "fwd": cfg.fwd_leg}
    budget = cfg.oz_budget_bytes if cfg.oz_budget_bytes > 0 \
        else OZ_AUTO_BUDGET
    enabled = {l for l in legs if knobs[l] == "ozaki"}
    spent = sum(legs[l] for l in enabled)
    for l in ("out", "tab", "pz", "fwd"):
        if knobs[l] == "auto" and l not in enabled \
                and spent + legs[l] <= budget:
            enabled.add(l)
            spent += legs[l]
    return frozenset(enabled)


# Auto HBM budget for the int8 packs.  Measured: the full nk=512 pack set
# (~2.6 GB) loads and runs on a 16 GB v5e alongside the f64 engine
# constants and the solve working set; 6 GB leaves the same headroom
# proportionally for nk=1024-class grids to drop their largest legs.
OZ_AUTO_BUDGET = 6 * 10 ** 9

# Per-leg cancellation guards for the oz_bits truncation (extra mantissa
# bits kept beyond the requested coverage): the composite out leg
# concentrates the RSD-family J cancellation (~2^13 of slice-product
# scale, _oz_sa docstring); the PZ Toeplitz contraction cancels ~1e8
# (~2^27) per element (probe_pz_ozaki.py).
OZ_EXTRA_OUT = 13
OZ_EXTRA_PZ = 27


@functools.lru_cache(maxsize=8)
def _ozaki_out_consts(cfg: SolverConfig):
    """Composite per-family output matrices, Ozaki-split.

    The windowed output leg (rfft of the convolution product -> per-family
    f/tau phase -> restricted backward DFT -> prek) is linear per family:
    J_f = prod_f @ G_f with G_f = [FC|(-FS)] . diag-phase . [Bc;Bs] and
    prek folded into the columns.  G is split on a per-column power-of-two
    grid into integer slices (|t| < 2^q) so that every pairwise product
    against the activation slices accumulates EXACTLY in f32 on the MXU
    (Ozaki scheme) — full f64-grade accuracy from bf16 matmul passes.

    Returns (g_sl [K, sb*(nk+1)] per family stacked as [nf, K, sb*O]
    f32-integer-valued, col_scale [nf, 1, 1, O] f64, sb)."""
    g = make_grids(cfg)
    co = fastpt_coeffs(cfg)
    npts = g.npts
    fwd, bwd = _restricted_out_consts(cfg)
    n2h = npts + 1
    FC, FSn = fwd[:, :n2h], fwd[:, n2h:]
    Bc, Bs = bwd[:n2h], bwd[n2h:]
    prek_out = np.asarray(co.prek)[:, _out_columns(g)]
    K = 2 * npts
    O = g.nk + 1
    G = np.empty((NFAM, K, O))
    for f in range(NFAM):
        fr, fi = np.asarray(co.fh_re[f]), np.asarray(co.fh_im[f])
        G[f] = (FC @ (fr[:, None] * Bc + fi[:, None] * Bs)
                + FSn @ (fr[:, None] * Bs - fi[:, None] * Bc))
        G[f] *= prek_out[f][None, :]
    # int8 magnitude caps the slice width at 7 bits, and the CONSUMER
    # (compute_J_PZ_windowed) reconstructs with min(_oz_q(K), 7) — an
    # uncapped q here both wraps the top slice in int8 (2^(q-1) = 128 at
    # q = 8) and mismatches the consumer's diagonal scales for grids
    # with K <= 256 (nk <= 32 at np_factor 4)
    q = min(_oz_q(K), 7)
    sb = -(-53 // q)             # full f64 mantissa coverage of G
    # two-sided balancing: the per-family f coefficients grow by many
    # orders across h, so a column-only slice grid spends its bits on the
    # huge-|fh| rows and truncates the rows where the data lives.  Fold a
    # per-row power-of-two scale into the ACTIVATION (exact f64 multiply)
    # so the sliced matrix is balanced and Ozaki truncation tracks true
    # contribution magnitudes.
    rmx = np.abs(G).max(axis=2, keepdims=True)            # [nf, K, 1]
    rh = 2.0 ** np.round(np.log2(np.where(rmx > 0, rmx, 1.0)))
    Gb = G / rh
    mx = np.abs(Gb).max(axis=1, keepdims=True)
    # +2: top slice < 2^(q-1) so slice-product sums stay strictly below
    # the int32/f32 exact boundaries
    e = 2.0 ** (np.floor(np.log2(np.maximum(mx, 1e-300))) + 2)
    r = Gb / e
    sl = []
    for j in range(sb):
        t = np.round(r * 2.0 ** (q * (j + 1)))
        sl.append(t.astype(np.int8))
        r = r - t / 2.0 ** (q * (j + 1))
    # diagonal-grouped int8 packs: diagonal d pairs activation slice i
    # with matrix slice d-i at the shared scale 2^{-q(d+2)}; each
    # diagonal is ONE batched int8 dot over a K-concat of slices
    sa = -(-56 // q)
    # full coverage keeps every pair with min(i,j) = 0 (dropped pairs
    # have i,j >= 1 and i+j > cut, weighing <= 2^{-q(cut+4)});
    # cfg.oz_bits > 0 truncates to ~oz_bits + the RSD-cancellation guard
    cut = _leg_cut(max(sa, sb) - 1, q, cfg.oz_bits, OZ_EXTRA_OUT)
    diags = []
    for d in range(cut + 1):
        js = [d - i for i in range(sa) if 0 <= d - i < sb]
        if not js:
            break
        diags.append(np.concatenate([sl[j] for j in js], axis=1))
    return (tuple(diags), e.reshape(NFAM, 1, 1, O), sa, sb,
            rh.reshape(NFAM, 1, 1, K))


def _oz_split_rows(x, q: int, s: int):
    """f32-only Ozaki split of the last axis onto a per-row power-of-two
    integer grid: x [..., K] f64 -> (slices [s, ..., K] f32-integer-valued,
    row scale [..., 1] f64).  No emulated-f64 arithmetic beyond one
    subtraction: the f64 value is consumed as its exact (hi, lo) f32 pair
    and sliced with exact power-of-two f32 operations."""
    ah = x.astype(jnp.float32)
    al = (x - ah.astype(x.dtype)).astype(jnp.float32)
    mx = jnp.max(jnp.abs(ah), axis=-1, keepdims=True)
    ex = jnp.floor(jnp.log2(jnp.maximum(mx, jnp.float32(1e-38)))) + 2.0
    # build 2^-ex EXACTLY by f32 exponent bit-casting (dd.inv_pow2):
    # jnp.exp2 lowers through pow and is ~1e-8 off for plain integer
    # arguments, which would put the slices on a non-power-of-two grid
    # and cap the whole reconstruction at that error
    exi = jnp.clip(ex, -125.0, 125.0).astype(jnp.int32)
    inv = dd.inv_pow2(exi)
    r = ah * inv
    yl = al * inv
    sls = []
    for i in range(s):
        sc = np.float32(2.0 ** (q * (i + 1)))
        t = jnp.round(r * sc)
        sls.append(t)
        r = r - t / sc
        if i == 2:               # fold in the lo half once the hi bits
            r = r + yl           # above its leading bit are consumed
    # 2^ex = 1/inv exactly (division of 1 by a power of two), portable
    # to the TPU's non-IEEE emulated f64 (no f64 bitcasts needed)
    return jnp.stack(sls), 1.0 / inv.astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _ozaki_tab_consts(cfg: SolverConfig):
    """Diagonal-grouped int8 Ozaki slices of the convolution backward
    matrix (dft_bwd_half).  Slice products of q-bit integers accumulate
    EXACTLY in int32, so the f64 dot becomes cut+1 int8 MXU dots whose
    lhs is a K-concat of activation slices.  Returns (diags: tuple of
    [len_d*K, 2np] f32-integer arrays (cast to int8 at pack time),
    col_scale [1, 2np] f64, sa, sb, cut)."""
    B = _half_leg_consts(cfg)[1]                  # [K, 2np]
    K = B.shape[0]
    # int8 magnitude caps the slice width at 7 bits (top slice reaches
    # 2^(q-1) with the guard bit; 2^7 would wrap int8)
    q = min(_oz_q(K), 7)
    sa = _oz_sa(q)
    sb = -(-53 // q)
    # full: sa - 2 measured ~3e-13 of scale; oz_bits truncates further
    cut = _leg_cut(sa - 2, q, cfg.oz_bits, 0)
    mx = np.abs(B).max(axis=0, keepdims=True)
    e = 2.0 ** (np.floor(np.log2(np.maximum(mx, 1e-300))) + 2)
    r = B / e
    sl = []
    for j in range(sb):
        t = np.round(r * 2.0 ** (q * (j + 1)))
        sl.append(t.astype(np.int8))
        r = r - t / 2.0 ** (q * (j + 1))
    diags = []
    for d in range(cut + 1):
        js = [d - i for i in range(sa) if 0 <= d - i < sb]
        diags.append(np.concatenate([sl[j] for j in js], axis=0))
    return tuple(diags), e, sa, sb, cut


def _oz_pack_np(M: np.ndarray, cut: int | None = None):
    """Generic diagonal-grouped int8 Ozaki pack of a static matrix
    M [K, O] with TWO-SIDED balancing: a per-row (contraction-dim)
    power-of-two scale rh folds into the ACTIVATION at apply time (an
    exact f64 multiply), so the sliced matrix M/rh is balanced across
    rows and per-element cancellation in the contraction is absorbed by
    the exact-int32 accumulation instead of being truncated away
    (scripts/probe_pz_ozaki.py).  Returns (diags tuple of
    [len_d*K, O] int8, col_scale e [1, O] f64, row_scale rh [1, K] f64,
    q, sa, sb)."""
    K = M.shape[0]
    q = min(_oz_q(K), 7)
    sa = _oz_sa(q)
    sb = -(-53 // q)
    rmx = np.abs(M).max(axis=1, keepdims=True)
    rh = 2.0 ** np.round(np.log2(np.where(rmx > 0, rmx, 1.0)))
    Mb = M / rh
    mx = np.abs(Mb).max(axis=0, keepdims=True)
    e = 2.0 ** (np.floor(np.log2(np.maximum(mx, 1e-300))) + 2)
    r = Mb / e
    sl = []
    for j in range(sb):
        t = np.round(r * 2.0 ** (q * (j + 1)))
        sl.append(t.astype(np.int8))
        r = r - t / 2.0 ** (q * (j + 1))
    if cut is None:
        cut = max(sa, sb) - 1
    diags = []
    for d in range(cut + 1):
        js = [d - i for i in range(sa) if 0 <= d - i < sb]
        if not js:
            break
        diags.append(np.concatenate([sl[j] for j in js], axis=0))
    return tuple(diags), e, rh.reshape(1, K), q, sa, sb


def _oz_dot(x, diags, e, rh, q: int, sa: int, sb: int):
    """x [..., K] @ M -> [..., O] through a generic diagonal-grouped
    int8 pack from _oz_pack_np.  The per-row scale rh folds into the
    activation exactly; every diagonal is one int8 MXU dot with exact
    int32 accumulation."""
    shape = x.shape[:-1]
    K = x.shape[-1]
    xsl, xe = _oz_split_rows(x * rh.reshape((1,) * len(shape) + (K,)),
                             q, sa)
    x8 = xsl.astype(jnp.int8).reshape(sa, -1, K)
    tot = None
    for d, rhs in enumerate(diags):
        iis = [i for i in range(sa) if 0 <= d - i < sb]
        lhs = jnp.concatenate([x8[i] for i in iis], axis=-1)
        o = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.int32)
        c = o.astype(x.dtype) * (2.0 ** (-q * (d + 2)))
        tot = c if tot is None else tot + c
    O = diags[0].shape[1]
    return (tot * e).reshape(shape + (O,)) * xe


@functools.lru_cache(maxsize=8)
def _ozaki_pz_consts(cfg: SolverConfig):
    """Ozaki pack of the windowed PZ Toeplitz contraction
    conv[n,a,i] = sum_m T[n,i,m] P[a,m], flattened to A[a,m] @
    M[m, (n,i)].  The contraction cancels ~1e8 of its operand-product
    scale per element, which defeats a column-only slice grid (measured
    1.5e-5 of the PZ maximum); the two-sided balancing of _oz_pack_np
    reproduces the f64 einsum to ~1e-16 of the result maximum."""
    g = make_grids(cfg)
    co = fastpt_coeffs(cfg)
    npts, nk = g.npts, g.nk
    T_sl = np.asarray(co.toeplitz[:, g.nshift:g.nshift + nk, :])
    M = T_sl.transpose(2, 0, 1).reshape(npts, NFAM_J * nk)
    qt = min(_oz_q(npts), 7)
    cut = _leg_cut(max(_oz_sa(qt), -(-53 // qt)) - 1, qt,
                   cfg.oz_bits, OZ_EXTRA_PZ)
    return _oz_pack_np(M, cut)


@functools.lru_cache(maxsize=8)
def _ozaki_fwd_consts(cfg: SolverConfig):
    """Ozaki packs for the forward stage: the Pab extension dot
    (lnP [3, nk] @ pab_M.T [nk, np]) and the windowed forward transform
    ((P_e kbias) [3, np] @ dft_fwd_half [np, 2*half]).  Both are plain
    f64 dots on the element-traffic-bound emulated path; the int8
    diagonal scheme reproduces them below the f64 dots' own rounding
    (dropped pairs weigh ~2^-77 of operand scale vs the dot's 2^-53)."""
    M, _ = _pab_ext(cfg)                      # [npts, nk], used as lnP @ M.T
    fwd = _half_leg_consts(cfg)[0]            # [np, 2*half]

    def cut_for(K):
        q = min(_oz_q(K), 7)
        return _leg_cut(max(_oz_sa(q), -(-53 // q)) - 1, q, cfg.oz_bits, 0)

    return (_oz_pack_np(np.asarray(M).T, cut_for(cfg.nk)),
            _oz_pack_np(np.asarray(fwd), cut_for(cfg.npts)))


@functools.lru_cache(maxsize=8)
def _radix_consts(cfg: SolverConfig):
    """Split-DIT constants for the output-leg forward rfft (length n=2np,
    radix r): the subsequence forward matrix [m, 2(m/2+1)] (m = n/r, re|im
    stacked on columns) and the twiddle factors e^{-2 pi i s k / n} as
    (tw_re, tw_im) [r, n/2+1].  X_k = sum_s tw[s,k] * F_s(k mod m) with
    F_s the rfft of subsequence x[s::r], Hermitian-extended."""
    g = make_grids(cfg)
    r = cfg.conv_radix
    n = 2 * g.npts
    m = n // r
    fc, fs, _, _ = fourier._dft_matrices(m)
    fwd = np.concatenate([fc, -fs], axis=1)         # [m, 2(m/2+1)]
    s = np.arange(r)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = 2.0 * np.pi * s * k / n
    return fwd, np.cos(ang), -np.sin(ang)


@functools.lru_cache(maxsize=8)
def _half_leg_consts(cfg: SolverConfig):
    """Single-dot matrices for the windowed path's forward and
    convolution-backward legs.

    Forward: rfft(x)[:half] with the WC coefficient window applied is
    x @ [fc[:, :half].wc | -fs[:, :half].wc]  (re and im stacked on
    columns).  Backward: the coefficient half-spectra are zero above
    `half`, so the unnormalized length-2np backward transform is
    [re | im] @ [bc[:half] ; bs[:half]] — the zero rows and the (always
    zero) Nyquist row of the generic hc_backward drop out.  Numpy f64;
    returns (fwd [np, 2*half], bwd [2*half, 2np])."""
    g = make_grids(cfg)
    half = g.npts // 2
    fc, fs, _, _ = fourier._dft_matrices(g.npts)
    wc = g.wc[:half]
    fwd = np.concatenate([fc[:, :half] * wc, -fs[:, :half] * wc], axis=1)
    _, _, bc2, bs2 = fourier._dft_matrices(2 * g.npts)
    bwd = np.concatenate([bc2[:half], bs2[:half]], axis=0)
    return fwd, bwd


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
    dft_2np: object         # None in matmul mode (direct convolution)
    dft_out: object         # (bc, bs) even-sample backward pair (matmul)
    # solver-window-restricted output transform (matmul mode): a SHARED
    # forward pair [FC | -FS] and a SHARED even-sample backward pair
    # [Bc_o ; Bs_o] restricted to the solver window plus the PMR low-k
    # point; the per-family f/tau phase stays an elementwise multiply
    # between the two flat dots (batched-dim f64 dots run ~8x slower per
    # MAC than flat dots on this runtime — docs/TPU_NOTES.md)
    dft_conv_fwd: object = None   # [2np, 2(np+1)] = [FC | -FS]
    dft_bwd_out: object = None    # [2(np+1), nk+1] = [Bc_o ; Bs_o]
    prek_out: object = None       # [NFAM, nk+1] prek at the window columns
    toeplitz_sl: object = None    # [7, nk, np] Toeplitz rows in the window
    pz_kfac_sl: object = None     # [nk]
    # single-dot convolution legs (windowed path): forward matrix with the
    # coefficient window folded in and re|im stacked on columns, and the
    # length-2np backward matrix restricted to the half nonzero freqs with
    # re|im stacked on rows
    dft_fwd_half: object = None   # [np, 2*half] = [fc.wc | -fs.wc]
    dft_bwd_half: object = None   # [2*half, 2np] = [bc[:half]; bs[:half]]
    # split-DIT forward rfft on the output leg (conv_radix > 1): the
    # length-2np/r subsequence forward matrix and the twiddle factors
    dft_fwd_sub: object = None    # [m, 2(m/2+1)], m = 2np/conv_radix
    tw_re: object = None          # [r, np+1]
    tw_im: object = None          # [r, np+1]
    # Ozaki composite output leg (out_leg 'ozaki'/'auto'): integer bf16
    # slices of the per-family composite matrix and the f64 column scales
    oz_g_diags: object = None     # tuple of [NFAM, len_d*2np, nk+1] int8
    oz_g_scale: object = None     # [NFAM, 1, 1, nk+1] f64
    oz_row: object = None         # [NFAM, 1, 1, 2np] f64 row balancing
    oz_b_diags: object = None     # tuple of [len_d*K, 2np] int8 diagonals
    oz_b_scale: object = None     # [1, 2np] f64 column scales
    # Ozaki PZ Toeplitz leg (pz_leg 'ozaki'/'auto'): two-sided-balanced
    # int8 diagonal slices of the windowed Toeplitz contraction
    oz_t_diags: object = None     # tuple of [len_d*np, 7*nk] int8
    oz_t_scale: object = None     # [1, 7*nk] f64 column scales
    oz_t_row: object = None       # [1, np] f64 row scales (fold into P)
    # Ozaki forward stage (fwd_leg 'ozaki'/'auto'): Pab extension dot and
    # windowed forward transform as generic int8 diagonal packs
    oz_e_diags: object = None     # ext: tuple of [len_d*nk, np] int8
    oz_e_scale: object = None     # [1, np]
    oz_e_row: object = None       # [1, nk]
    oz_f_diags: object = None     # fwd: tuple of [len_d*np, 2*half] int8
    oz_f_scale: object = None     # [1, 2*half]
    oz_f_row: object = None       # [1, np]
    # matmul-form assembly (asm_leg 'matmul'/'auto'): the basis-probed
    # compact coefficient rows, their k-power weights, and the output
    # scatter (assembly.asm_consts)
    asm_C: object = None          # [nrows, 190] f64
    asm_kw: object = None         # [nrows, nk] f64
    asm_S: object = None          # [55, nrows] f64



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
    _note_leg_resolution(cfg, mode)
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
        dft_2np=(fourier.dft_consts(2 * g.npts, tdt)
                 if use_matmul and cfg.conv_impl == "fft" else None),
        dft_out=_dft_out_consts(2 * g.npts, tdt) if use_matmul else None,
        dft_conv_fwd=(t(_restricted_out_consts(cfg)[0])
                      if use_matmul and cfg.conv_impl == "fft" else None),
        dft_bwd_out=(t(_restricted_out_consts(cfg)[1])
                     if use_matmul and cfg.conv_impl == "fft" else None),
        dft_fwd_half=(t(_half_leg_consts(cfg)[0])
                      if use_matmul and cfg.conv_impl == "fft" else None),
        dft_bwd_half=(t(_half_leg_consts(cfg)[1])
                      if use_matmul and cfg.conv_impl == "fft" else None),
        prek_out=(t(co.prek[:, _out_columns(g)]) if use_matmul else None),
        toeplitz_sl=(t(co.toeplitz[:, g.nshift:g.nshift + g.nk, :])
                     if use_matmul else None),
        pz_kfac_sl=(t(co.pz_kfac[g.nshift:g.nshift + g.nk])
                    if use_matmul else None),
        **({"dft_fwd_sub": t(_radix_consts(cfg)[0]),
            "tw_re": t(_radix_consts(cfg)[1]),
            "tw_im": t(_radix_consts(cfg)[2])}
           if use_matmul and cfg.conv_impl == "fft" and cfg.conv_radix > 1
           else {}),
        **({"oz_g_diags": tuple(jnp.asarray(d)
                                for d in _ozaki_out_consts(cfg)[0]),
            "oz_g_scale": jnp.asarray(_ozaki_out_consts(cfg)[1]),
            "oz_row": jnp.asarray(_ozaki_out_consts(cfg)[4])}
           if (use_matmul and cfg.conv_impl == "fft"
               and cfg.engine_transform_dtype == "float64"
               and "out" in _oz_enabled(cfg))
           else {}),
        **({"oz_b_diags": tuple(jnp.asarray(d)
                                for d in _ozaki_tab_consts(cfg)[0]),
            "oz_b_scale": jnp.asarray(_ozaki_tab_consts(cfg)[1])}
           if (use_matmul and cfg.conv_impl == "fft"
               and cfg.engine_transform_dtype == "float64"
               and "tab" in _oz_enabled(cfg))
           else {}),
        **({"oz_t_diags": tuple(jnp.asarray(d)
                                for d in _ozaki_pz_consts(cfg)[0]),
            "oz_t_scale": jnp.asarray(_ozaki_pz_consts(cfg)[1]),
            "oz_t_row": jnp.asarray(_ozaki_pz_consts(cfg)[2])}
           if (use_matmul and cfg.conv_impl == "fft"
               and cfg.engine_transform_dtype == "float64"
               and "pz" in _oz_enabled(cfg))
           else {}),
        **({"oz_e_diags": tuple(jnp.asarray(d)
                                for d in _ozaki_fwd_consts(cfg)[0][0]),
            "oz_e_scale": jnp.asarray(_ozaki_fwd_consts(cfg)[0][1]),
            "oz_e_row": jnp.asarray(_ozaki_fwd_consts(cfg)[0][2]),
            "oz_f_diags": tuple(jnp.asarray(d)
                                for d in _ozaki_fwd_consts(cfg)[1][0]),
            "oz_f_scale": jnp.asarray(_ozaki_fwd_consts(cfg)[1][1]),
            "oz_f_row": jnp.asarray(_ozaki_fwd_consts(cfg)[1][2])}
           if (use_matmul and cfg.conv_impl == "fft"
               and cfg.engine_transform_dtype == "float64"
               and "fwd" in _oz_enabled(cfg))
           else {}),
        **({"asm_C": jnp.asarray(_asm_consts_np(cfg)[0]),
            "asm_kw": jnp.asarray(_asm_consts_np(cfg)[1]),
            "asm_S": jnp.asarray(_asm_consts_np(cfg)[2])}
           if _asm_leg_resolved(cfg) == "matmul" else {}))


@functools.lru_cache(maxsize=8)
def _asm_consts_np(cfg: SolverConfig, with_rsd: bool = True):
    from redtime_tpu import assembly
    return assembly.asm_consts(np.asarray(make_grids(cfg).k), with_rsd)


def _asm_leg_resolved(cfg: SolverConfig) -> str:
    # measured: the matmul form is ~15% slower per full-TRG solve on the
    # TPU runtime (see config.asm_leg) — direct wins on every backend
    return "direct" if cfg.asm_leg == "auto" else cfg.asm_leg


def _fwd_leg_resolved(cfg: SolverConfig) -> str:
    leg = cfg.fwd_leg
    if leg == "auto":
        leg = "ozaki" if _target_platform() == "tpu" else "dot"
    return leg


def resolved_legs(cfg: SolverConfig, mode: str = "auto") -> dict:
    """What every engine leg ACTUALLY runs as for this (cfg, mode,
    platform) — the resolved value of each 'auto' knob.  Keys:
    out/tab/pz/fwd ('ozaki' | 'dot'), asm ('direct' | 'matmul'),
    fft ('matmul' | 'fft'), interp/conv backends.  Use this (or the
    CLI's --show-legs) to see whether the MXU fast paths are engaged."""
    use_matmul = fourier._resolve(mode) == "matmul"
    plat = _target_platform()
    packed = (use_matmul and cfg.conv_impl == "fft"
              and cfg.engine_transform_dtype == "float64")
    enabled = _oz_enabled(cfg) if packed else frozenset()
    res = {}
    for leg, knob in (("out", cfg.out_leg), ("tab", cfg.tab_leg),
                      ("pz", cfg.pz_leg), ("fwd", cfg.fwd_leg)):
        want = knob if knob != "auto" else (
            "ozaki" if plat == "tpu" else "dot")
        res[leg] = "ozaki" if (want == "ozaki" and leg in enabled) \
            else "dot"
    res["asm"] = _asm_leg_resolved(cfg)
    res["fft"] = "matmul" if use_matmul else "fft"
    res["transform_dtype"] = cfg.engine_transform_dtype
    return res


_LEG_NOTES_EMITTED: set = set()


def _note_leg_resolution(cfg: SolverConfig, mode: str) -> None:
    """One-time stderr note when an 'auto' knob resolves AWAY from its
    platform fast path (e.g. the Ozaki packs exceed the HBM budget on a
    big grid) — so a silent order-of-magnitude cliff is announced
    (round-2 VERDICT: the nk=512 fallback was invisible)."""
    import sys as _sys

    key = (cfg, mode, _target_platform())
    if key in _LEG_NOTES_EMITTED:
        return
    _LEG_NOTES_EMITTED.add(key)
    if _target_platform() != "tpu":
        return
    packed = (fourier._resolve(mode) == "matmul" and cfg.conv_impl == "fft"
              and cfg.engine_transform_dtype == "float64")
    if not packed:
        # f32 engine / direct conv / fft mode are explicit config choices
        # with their own documented cost model, not a silent fallback
        return
    res = resolved_legs(cfg, mode)
    knobs = {"out": cfg.out_leg, "tab": cfg.tab_leg,
             "pz": cfg.pz_leg, "fwd": cfg.fwd_leg}
    slow = [l for l, knob in knobs.items()
            if knob == "auto" and res[l] != "ozaki"]
    if slow:
        bts = _oz_leg_bytes(cfg)
        detail = ", ".join(f"{l} ({bts[l] / 1e9:.2f} GB pack)"
                           for l in slow)
        print(f"# redtime_tpu: engine fast path DISENGAGED for leg(s) "
              f"{detail} at nk={cfg.nk} — falling back to emulated-f64 "
              f"dots (expect a large slowdown; raise "
              f"SolverConfig.oz_budget_bytes or lower nk). Resolved legs: "
              f"{res}", file=_sys.stderr)


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
    if (ec is not None and ec.oz_e_diags is not None
            and _fwd_leg_resolved(cfg) == "ozaki"):
        q = min(_oz_q(cfg.nk), 7)
        lnP_ext = _oz_dot(lnP3, ec.oz_e_diags, ec.oz_e_scale, ec.oz_e_row,
                          q, _oz_sa(q), -(-53 // q)) + (n_s - 3.0) * v
    else:
        with jax.default_matmul_precision("highest"):
            lnP_ext = lnP3 @ M.T + (n_s - 3.0) * v
    # TPU finite-range guard (trg.LNP_MIN/MAX note): the edge-slope
    # extrapolation can amplify rejected-trial garbage, and exp() of it
    # is inf on the TPU's f32-exponent-range emulated f64, which crashes
    # the solve while_loop.  Physical lnP_ext peaks ~13 — identity there.
    lnP_ext = jnp.clip(lnP_ext, -80.0, 20.0)
    return jnp.exp(lnP_ext) * wp


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _target_platform() -> str:
    """Platform computation actually lands on (honors jax_default_device,
    which tests pin to CPU while an accelerator plugin owns the default
    backend)."""
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    return dev.platform


def _spectral_conv_direct(sa_re, sa_im, sb_re, sb_im, npts: int,
                          impl: str = "auto"):
    """C_h = sum_{m+n=h} Sa_m Sb_n for Hermitian spectra Sa, Sb given as
    half-spectra [nfam, 3, half] with support < n2/2 (zero-padded linear
    convolution) — evaluated DIRECTLY:

        C_h = sum_{m=0}^{half-1} sa_m sbz_{h-m}
            + sum_{m=1}^{half-1} conj(sa_m) sbz_{h+m},   h in [0, npts]

    (sbz_j = sb_j for 0 <= j < half, conj(sb_{-j}) for j < 0, else 0.)
    Mathematically identical to the reference's ifft-multiply-fft
    convolution (redTime.cc:373-394) but costs O(half^2) sliding-window
    MACs instead of three length-2np DFT matmuls — on TPU the emulated-f64
    DFTs dominate the whole solve, and the spectra have only np/2
    coefficients.  Two implementations of the same sum (both 1e-13-equal
    to the FFT route): 'conv' uses one grouped conv_general_dilated (the
    TPU-native sliding-window primitive; index gathers serialize on TPU),
    'gather' builds the Toeplitz/Hankel blocks by static gather (fast on
    CPU, where XLA's grouped f64 conv is pathologically slow).  Returns
    (c_re, c_im) [nfam, 3, 3, npts + 1]: the [a x b] spectrum cross
    products are formed here."""
    if impl == "auto":
        impl = "conv" if _target_platform() == "tpu" else "gather"
    half = sa_re.shape[-1]
    nfam = sa_re.shape[0]
    dt = sa_re.dtype

    # sbz over j in [-(half-1), npts + half - 1]: [conj tail | sb | zeros]
    zpad = jnp.zeros(sb_re.shape[:-1] + (npts,), dt)
    sbz_re = jnp.concatenate([sb_re[..., :0:-1], sb_re, zpad], axis=-1)
    sbz_im = jnp.concatenate([-sb_im[..., :0:-1], sb_im, zpad], axis=-1)

    if impl == "gather":
        m = np.arange(half)[:, None]
        h = np.arange(npts + 1)[None, :]
        i1 = jnp.asarray(half - 1 + h - m)
        i2 = jnp.asarray(half - 1 + h + m)
        sa0_re = sa_re.at[..., 0].set(0.0)
        sa0_im = sa_im.at[..., 0].set(0.0)

        def dot(x, Y):
            return jnp.einsum("fam,fbmh->fabh", x, Y)

        SB1_re, SB1_im = sbz_re[..., i1], sbz_im[..., i1]
        SB2_re, SB2_im = sbz_re[..., i2], sbz_im[..., i2]
        c_re = (dot(sa_re, SB1_re) - dot(sa_im, SB1_im)
                + dot(sa0_re, SB2_re) + dot(sa0_im, SB2_im))
        c_im = (dot(sa_re, SB1_im) + dot(sa_im, SB1_re)
                + dot(sa0_re, SB2_im) - dot(sa0_im, SB2_re))
        return c_re, c_im
    # Term1 window reads sbz[(h) + m'] with kernel sa reversed;
    # Term2 window reads sbz[(half-1+h) + m] with kernel conj(sa), m>0
    lhs1 = jnp.stack([sbz_re, sbz_im], axis=2)      # [nfam, 3b, 2, L]
    lhs2 = lhs1[..., half - 1:]
    L = npts + half                                  # window span needed
    lhs1 = lhs1[..., :L]
    lhs2 = lhs2[..., :L]

    # groups = (nfam, b, sb-component); per group 3a x 2 sa-component outs
    G = nfam * 3 * 2
    lhs = jnp.concatenate([lhs1, lhs2], axis=0)      # [2*nfam, 3, 2, L]
    lhs = lhs.reshape(1, 2 * G, L)

    sa_rev = jnp.stack([sa_re[..., ::-1], sa_im[..., ::-1]], axis=2)
    sa_cnj = jnp.stack([sa_re.at[..., 0].set(0.0),
                        -sa_im.at[..., 0].set(0.0)], axis=2)
    # kernels[f, b, sbc, a, sac, m]: independent of (b, sbc) — broadcast
    k1 = jnp.broadcast_to(sa_rev[:, None, None],
                          (nfam, 3, 2, 3, 2, half))
    k2 = jnp.broadcast_to(sa_cnj[:, None, None],
                          (nfam, 3, 2, 3, 2, half))
    rhs = jnp.concatenate([k1, k2], axis=0)          # [2nfam,3,2,3,2,half]
    rhs = rhs.reshape(2 * G * 6, 1, half)

    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=2 * G)                   # [1, 2G*6, npts+1]
    out = out.reshape(2, nfam, 3, 2, 3, 2, npts + 1)
    t1, t2 = out[0], out[1]                          # [f, b, sbc, a, sac, h]

    def comb(t):
        rr, ri = t[:, :, 0, :, 0], t[:, :, 0, :, 1]
        ir, ii = t[:, :, 1, :, 0], t[:, :, 1, :, 1]
        return rr, ri, ir, ii

    rr1, ri1, ir1, ii1 = comb(t1)
    rr2, ri2, ir2, ii2 = comb(t2)
    # Term1: sa * sbz;  Term2: conj(sa) * sbz  (kernel already sign-fixed
    # on the im part, so Term2 combines like a plain product)
    c_re = (rr1 - ii1) + (rr2 - ii2)
    c_im = (ri1 + ir1) + (ri2 + ir2)
    # axes currently [f, b, a, h] -> [f, a, b, h]
    return (jnp.swapaxes(c_re, 1, 2), jnp.swapaxes(c_im, 1, 2))


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


def _coeff_spectra_pair(P_ext, nfam, mode, ec, half):
    """Forward transform + per-family gamma-coefficient products:
    returns (sa_re, sa_im, sb_re, sb_im), each [nfam, 3, half]."""
    re, im = fourier.rfft(P_ext * ec.kbias, mode, ec.dft_np)
    re, im = re * ec.wc, im * ec.wc
    ca_re, ca_im = re[:, :half], im[:, :half]       # freqs [0, np/2)

    def coeff_spectra(gr, gi):
        return _cmul(ca_re[None], ca_im[None],
                     gr[:nfam, None], gi[:nfam, None])

    sa_re, sa_im = coeff_spectra(ec.ga_re, ec.ga_im)
    sb_re, sb_im = coeff_spectra(ec.gb_re, ec.gb_im)
    return sa_re, sa_im, sb_re, sb_im


def _conv_prod(sa_re, sa_im, sb_re, sb_im, npts, mode, ec):
    """Pair products in sequence space: [nfam, 3, 3, 2np]."""
    n2 = 2 * npts
    half = sa_re.shape[-1]
    pad = jnp.zeros(sa_re.shape[:-1] + (npts + 1 - half,), sa_re.dtype)
    padc = lambda x: jnp.concatenate([x, pad], -1)
    ta = fourier.hc_backward(padc(sa_re), padc(sa_im), n2, mode,
                             ec.dft_2np)
    tb = fourier.hc_backward(padc(sb_re), padc(sb_im), n2, mode,
                             ec.dft_2np)
    return ta[:, :, None, :] * tb[:, None, :, :] / n2


def _compute_J_PZ_body(cfg, P_ext, with_rsd, mode, ec, g, npts, half, nfam):
    # run the transform pipeline in the engine-consts dtype (f32 when
    # cfg.engine_transform_dtype == 'float32'); outputs cast back at exit
    out_dt = P_ext.dtype
    P_ext = P_ext.astype(ec.kbias.dtype)
    use_matmul = fourier._resolve(mode) == "matmul"
    use_direct = use_matmul and cfg.conv_impl != "fft"

    # biased, coefficient-windowed forward transform of the three spectra
    # + per-family coefficient products [nfam, 3, half]
    sa_re, sa_im, sb_re, sb_im = _coeff_spectra_pair(P_ext, nfam, mode,
                                                     ec, half)

    # spectral convolution C_h = sum_{m+n=h} (c g^a)_m (c g^b)_n over all
    # 3x3 spectrum pairs (reference iconvolve/cconvolve step)
    n2 = 2 * npts
    if use_direct:
        # direct O(half^2) contraction — identical math, no length-2np
        # DFTs (those dominate the TPU solve in emulated f64)
        c_re, c_im = _spectral_conv_direct(sa_re, sa_im, sb_re, sb_im,
                                           npts, cfg.conv_impl)
    else:
        prod = _conv_prod(sa_re, sa_im, sb_re, sb_im, npts, mode,
                          ec)                              # [nf,3,3,2np]
        c_re, c_im = fourier.rfft(prod, mode, ec.dft_2np)  # [nf,3,3,np+1]

    # multiply by f (and tau phase, baked into fh), back-transform, sample
    # the even points (the reference's stride-2 read, redTime.cc:507,593)
    cf_re, cf_im = _cmul(c_re, c_im,
                         ec.fh_re[:nfam, None, None],
                         ec.fh_im[:nfam, None, None])
    if use_matmul:
        # backward transform evaluated only at the even sample points:
        # dft_out = (bc[:, ::2], bs[:, ::2]) of the length-2np matrices
        t = cf_re @ ec.dft_out[0] + cf_im @ ec.dft_out[1]
    else:
        t = fourier.hc_backward(cf_re, cf_im, n2, mode,
                                ec.dft_2np)[..., ::2]
    J = t * ec.prek[:nfam, None, None, :]

    if not with_rsd:
        J = jnp.concatenate(
            [J, jnp.zeros((NFAM - NFAM_J,) + J.shape[1:], J.dtype)], axis=0)

    # PZ: Toeplitz contraction + pointwise k^3 P_b factor (reference PZ_reg
    # output line :720-724 with the icd!=0 ratio construction :797-800)
    conv = jnp.einsum("nim,am->nai", ec.toeplitz, P_ext)
    PZ = ec.pz_kfac * conv[:, :, None, :] * P_ext[None, None]

    return J.astype(out_dt), PZ.astype(out_dt)


def compute_J_PZ_windowed(cfg: SolverConfig, P_ext: jnp.ndarray,
                          with_rsd: bool, mode: str = "auto",
                          ec: EngineConsts | None = None):
    """The engine restricted to the assembly's read set (the RHS hot path).

    Returns (J_w [NFAM, 3, 3, nk], J_lo scalar, PZ_w [7, 3, 3, nk]):
    J/PZ sampled only on the solver window plus the PMR low-k point
    (reference reads: redTime.cc:813-1279 [nshift+i], :1252 nloMR) —
    numerically identical to slicing compute_J_PZ's outputs, but the
    output-side backward DFT, f/tau phase and rfft(prod) collapse into
    one per-family fused matrix over nk+1 columns instead of two
    full-grid contractions (~4x fewer output-leg MACs).  Falls back to
    compute_J_PZ + slicing when the fused constants are unavailable
    (fft mode / direct convolution)."""
    g = make_grids(cfg)
    if ec is None:
        ec = engine_consts(cfg, mode)
    use_matmul = fourier._resolve(mode) == "matmul"
    nk = g.nk
    if not (use_matmul and cfg.conv_impl == "fft"
            and ec.dft_bwd_out is not None):
        J, PZ = compute_J_PZ(cfg, P_ext, with_rsd, mode, ec)
        sl = slice(g.nshift, g.nshift + nk)
        nlo = g.nshift - nk // 2
        return J[..., sl], J[0, 0, 0, nlo], PZ[..., sl]

    npts, half = g.npts, g.npts // 2
    nfam = NFAM if with_rsd else NFAM_J
    out_dt = P_ext.dtype
    P_e = P_ext.astype(ec.kbias.dtype)
    with jax.default_matmul_precision("highest"):
        # forward + coefficient window in one dot; re|im stacked on columns
        if (ec.oz_f_diags is not None
                and _fwd_leg_resolved(cfg) == "ozaki"):
            qf = min(_oz_q(npts), 7)
            ci = _oz_dot(P_e * ec.kbias, ec.oz_f_diags, ec.oz_f_scale,
                         ec.oz_f_row, qf, _oz_sa(qf), -(-53 // qf))
        else:
            ci = (P_e * ec.kbias) @ ec.dft_fwd_half   # [3, 2*half]
        ca_re, ca_im = ci[:, :half], ci[:, half:]

        def coeff(gr, gi):
            sr, si = _cmul(ca_re[None], ca_im[None],
                           gr[:nfam, None], gi[:nfam, None])
            return jnp.concatenate([sr, si], axis=-1)  # [nfam, 3, 2*half]

        # both convolution backward legs in one dot
        sab = jnp.stack([coeff(ec.ga_re, ec.ga_im),
                         coeff(ec.gb_re, ec.gb_im)])   # [2, nfam, 3, 2half]
        tleg = cfg.tab_leg
        if tleg == "auto":
            tleg = "ozaki" if _target_platform() == "tpu" else "dot"
        if tleg == "ozaki" and ec.oz_b_diags is not None:
            # diagonal-grouped int8 Ozaki contraction (exact int32 accum)
            q2 = min(_oz_q(npts), 7)   # int8 slice-magnitude cap
            sa2 = _oz_sa(q2)
            sb2 = -(-53 // q2)
            rows = 2 * nfam * 3
            n2 = 2 * npts
            xsl, xe = _oz_split_rows(sab, q2, sa2)     # [sa2,2,nf,3,K]
            x8 = xsl.astype(jnp.int8).reshape((sa2, rows, npts))
            tot = jnp.zeros((rows, n2), sab.dtype)
            for d, rhs in enumerate(ec.oz_b_diags):
                iis = [i for i in range(sa2) if 0 <= d - i < sb2]
                lhs = jnp.concatenate([x8[i] for i in iis], axis=-1)
                o = jax.lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.int32)
                tot = tot + o.astype(sab.dtype) * (2.0 ** (-q2 * (d + 2)))
            tab = (tot.reshape(2, nfam, 3, n2) * xe * ec.oz_b_scale[0])
        else:
            tab = sab @ ec.dft_bwd_half                # [2, nfam, 3, 2np]
        prod = tab[0][:, :, None, :] * tab[1][:, None, :, :] / (2 * npts)
        leg = cfg.out_leg
        if leg == "auto":
            leg = "ozaki" if _target_platform() == "tpu" else "dot"
        if leg == "ozaki" and ec.oz_g_diags is not None:
            # Ozaki composite output leg: J_f = prod_f @ G_f evaluated as
            # diagonal-grouped int8 slice dots with exact int32
            # accumulation on the MXU (the per-family composite matrix
            # G_f has the phase, restricted backward DFT and prek folded
            # in; two-sided balancing via oz_row)
            K = 2 * npts
            O = nk + 1
            q = min(_oz_q(K), 7)
            sa = -(-56 // q)
            sb = -(-53 // q)
            xsl, xe = _oz_split_rows(prod * ec.oz_row[:nfam], q,
                                     sa)            # [sa,nf,3,3,K]
            x8 = (jnp.moveaxis(xsl.astype(jnp.int8), 1, 0)
                  .reshape(nfam, sa, 9, K))
            tot = jnp.zeros((nfam, 9, O), P_e.dtype)
            for d, rhs in enumerate(ec.oz_g_diags):
                iis = [i for i in range(sa) if 0 <= d - i < sb]
                lhs = jnp.concatenate([x8[:, i] for i in iis], axis=-1)
                o = jax.lax.dot_general(
                    lhs, rhs[:nfam], (((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.int32)
                tot = tot + o.astype(P_e.dtype) * (2.0 ** (-q * (d + 2)))
            J = tot.reshape(nfam, 3, 3, O)
            Jw = J * xe * ec.oz_g_scale[:nfam]      # [nf,3,3,O]
            if not with_rsd:
                Jw = jnp.concatenate(
                    [Jw, jnp.zeros((NFAM - NFAM_J,) + Jw.shape[1:],
                                   Jw.dtype)], axis=0)
            J_lo = Jw[0, 0, 0, nk]
            Jw = Jw[..., :nk]
            PZw = _pz_windowed(cfg, ec, P_e, g, nk)
            return (Jw.astype(out_dt), J_lo.astype(out_dt),
                    PZw.astype(out_dt))
        # output leg: shared forward, per-family phase, shared restricted
        # backward — all flat dots
        n2h = npts + 1
        r = cfg.conv_radix
        if r > 1 and ec.dft_fwd_sub is not None:
            # split-DIT rfft: r interleaved subsequence rffts of length
            # m = 2np/r (1/r the dot MACs) + elementwise twiddle combine
            # X_k = sum_s e^{-2 pi i s k / n} F_s(k mod m)
            m = 2 * npts // r
            mh = m // 2 + 1
            xs = jnp.moveaxis(
                prod.reshape(prod.shape[:-1] + (m, r)), -1, -2)
            z = xs @ ec.dft_fwd_sub                    # [nf,3,3,r,2mh]
            fre, fim = z[..., :mh], z[..., mh:]
            # Hermitian period-m extension tiled over the np+1 columns
            pre = jnp.concatenate(
                [fre, jnp.flip(fre[..., 1:m // 2], -1)], -1)
            pim = jnp.concatenate(
                [fim, -jnp.flip(fim[..., 1:m // 2], -1)], -1)
            ere = jnp.concatenate([pre] * (r // 2) + [fre[..., :1]], -1)
            eim = jnp.concatenate([pim] * (r // 2) + [fim[..., :1]], -1)
            c_re = (ere * ec.tw_re - eim * ec.tw_im).sum(-2)
            c_im = (ere * ec.tw_im + eim * ec.tw_re).sum(-2)
        else:
            c = prod @ ec.dft_conv_fwd                 # [nf,3,3,2(np+1)]
            c_re, c_im = c[..., :n2h], c[..., n2h:]
        cf_re, cf_im = _cmul(c_re, c_im,
                             ec.fh_re[:nfam, None, None],
                             ec.fh_im[:nfam, None, None])
        t = jnp.concatenate([cf_re, cf_im], axis=-1) @ ec.dft_bwd_out
        Jw = t * ec.prek_out[:nfam, None, None, :]
        if not with_rsd:
            Jw = jnp.concatenate(
                [Jw, jnp.zeros((NFAM - NFAM_J,) + Jw.shape[1:], Jw.dtype)],
                axis=0)
        J_lo = Jw[0, 0, 0, nk]
        Jw = Jw[..., :nk]

        PZw = _pz_windowed(cfg, ec, P_e, g, nk)

    return Jw.astype(out_dt), J_lo.astype(out_dt), PZw.astype(out_dt)


def _pz_windowed(cfg: SolverConfig, ec: EngineConsts, P_e, g, nk):
    """PZ on the solver window: Toeplitz contraction x P_e outer factor.

    The contraction cancels ~1e8 of the operand scale per element
    against a smooth spectrum (the reference's own f64 brute-force conv
    carries the same conditioning), which defeats a column-only Ozaki
    slice grid (measured 1.5e-5 of the PZ maximum).  With TWO-SIDED
    balancing — a per-row power-of-two scale on the contraction dim
    folded into the activation as an exact f64 multiply — the int8
    diagonal scheme reproduces the f64 einsum to ~1e-16 of the result
    maximum (scripts/probe_pz_ozaki.py), so the pz_leg='ozaki' path runs
    it on the MXU like the J legs."""
    sl = slice(g.nshift, g.nshift + nk)
    pleg = cfg.pz_leg
    if pleg == "auto":
        pleg = "ozaki" if _target_platform() == "tpu" else "dot"
    if pleg == "ozaki" and ec.oz_t_diags is not None:
        q = min(_oz_q(g.npts), 7)
        conv = _oz_dot(P_e, ec.oz_t_diags, ec.oz_t_scale, ec.oz_t_row,
                       q, _oz_sa(q), -(-53 // q))
        conv = jnp.transpose(conv.reshape(3, NFAM_J, nk),
                             (1, 0, 2))                     # [7, 3, nk]
    else:
        conv = jnp.einsum("nim,am->nai", ec.toeplitz_sl, P_e)
    return ec.pz_kfac_sl * conv[:, :, None, :] * P_e[None, None, :, sl]
