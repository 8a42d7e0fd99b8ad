"""High-precision (mpmath) oracles for the FAST-PT coefficient layer.

The engine's gamma-function coefficients g/f (fastpt._g_raw/_f_raw;
reference `src/redTime.cc:306-355`) and the Taylor-switched Z kernels
(fastpt._z_reg; reference `:599-687`) are the special-function substrate
of the whole mode-coupling engine — including the REGULARIZED
J_{2,-2,0} family, whose f64 path is otherwise validated only through
end-to-end goldens (TODO.md known gaps).  These tests pin that layer
against 50-digit mpmath evaluations of the same mathematical
definitions: scipy-loggamma rounding, branch handling, and the Taylor
switches must all sit at f64 accuracy.

(Transcription fidelity of the ASSEMBLY coefficient tables is covered
separately by tests/test_assembly_oracle.py; continuum correctness of
the unregularized transforms by tests/test_quadrature.py.)
"""

import numpy as np
import pytest

mp = pytest.importorskip("mpmath")

from redtime_tpu.fastpt import (_f_raw, _g_raw, _z_reg, fastpt_coeffs)  # noqa: E402
from redtime_tpu.config import SolverConfig  # noqa: E402

mp.mp.dps = 50


def _g_mp(mu, re_kappa, im_kappa):
    """Gamma((mu+kappa+1)/2) / Gamma((mu-kappa+1)/2) at 50 digits."""
    top = mp.loggamma(mp.mpc(0.5 * (mu + re_kappa + 1.0), 0.5 * im_kappa))
    bot = mp.loggamma(mp.mpc(0.5 * (mu - re_kappa + 1.0), -0.5 * im_kappa))
    return mp.e ** (top.real - bot.real), top.imag - bot.imag


def _f_mp(re_rho, im_rho):
    g0, g1 = _g_mp(0.5, re_rho - 0.5, im_rho)
    pre = 0.5 * mp.sqrt(mp.pi) * mp.mpf(2) ** re_rho
    return pre * g0, im_rho * mp.log(2) + g1


def test_g_raw_matches_mpmath():
    """All (mu, kappa) combinations the engine uses: mu = 0.5 + ell,
    re_kappa = 1.5 + nu + alpha over the J and Jn0 family tables, with
    tau arguments spanning the coefficient index range."""
    nu = -2.0
    taus = [0.0, 0.1, 1.0, 7.3, 31.0, 120.0]
    for ell in (0, 1, 2, 3, 4, 6):
        for alpha in (-2, -1, 0, 1, 2):
            for tau in taus:
                mu = 0.5 + ell
                rk = 1.5 + nu + alpha
                # skip gamma poles at tau = 0 (the engine's g_dispatch
                # zeroes or regularizes exactly these slots)
                args = ((mu + rk + 1.0) / 2.0, (mu - rk + 1.0) / 2.0)
                if tau == 0.0 and any(
                        a <= 0.0 and a == int(a) for a in args):
                    continue
                g0, g1 = _g_raw(mu, rk, tau)
                m0, m1 = _g_mp(mu, rk, tau)
                assert abs(g0 / float(m0) - 1.0) < 1e-12, (ell, alpha, tau)
                # phases only enter through cos/sin: compare mod 2 pi
                d = (g1 - float(m1)) % (2.0 * np.pi)
                d = min(d, 2.0 * np.pi - d)
                assert d < 1e-12 * max(1.0, abs(float(m1))), \
                    (ell, alpha, tau)


def test_f_raw_matches_mpmath():
    """f_MFHB on both call patterns: the g_reg b-side (rho = nu, tau >= 0)
    and the output-leg coefficients (rho = -4 - 2 nu - (alpha+beta),
    tau <= 0) — the latter covers every J family's fh pack, the former
    the REGULARIZED family's b-side."""
    for rho in (-2.0, 0.0, 2.0, 1.5):
        for tau in (0.0, -0.5, -3.7, -60.0, 0.9, 12.0):
            # gamma pole of the denominator at tau = 0, (2 - rho)/2 a
            # nonpositive integer (the engine zeroes these slots)
            if tau == 0.0 and (2.0 - rho) / 2.0 <= 0.0 \
                    and (2.0 - rho) / 2.0 == int((2.0 - rho) / 2.0):
                continue
            f0, f1 = _f_raw(rho, tau)
            m0, m1 = _f_mp(rho, tau)
            assert abs(f0 / float(m0) - 1.0) < 1e-12, (rho, tau)
            d = (f1 - float(m1)) % (2.0 * np.pi)
            d = min(d, 2.0 * np.pi - d)
            assert d < 1e-11 * max(1.0, abs(float(m1))), (rho, tau)


def _z_exact_mp(n, r):
    """The exact Z_n(r) closed forms (reference redTime.cc:599-687,
    non-Taylor branches) at 50 digits, plus a CONDITION scale: the sum of
    term magnitudes, which bounds the f64 cancellation of the reference's
    own formula (near r = 1/eps the n = 3, 5 forms cancel ~1e4 of operand
    scale — the C++ exact branch carries the same rounding)."""
    r = mp.mpf(r)
    if n < 0:
        return _z_exact_mp(-n, 1 / r)
    if n == 0:
        return mp.mpf(1), mp.mpf(1)
    if r == 1:
        v = {1: mp.mpf(0), 3: mp.mpf(1), 5: mp.mpf(4) / 3}[n]
        return v, max(abs(v), mp.mpf(1))
    lnkq = mp.log(abs((1 + r) / (1 - r)))
    if n == 1:
        terms = [(1 - r) * lnkq]
    elif n == 3:
        terms = [r ** 2, mp.mpf(1) / 2 * (1 - r ** 3) * lnkq]
    elif n == 5:
        terms = [r ** 4, r ** 2 / 3, mp.mpf(1) / 2 * (1 - r ** 5) * lnkq]
    else:
        raise ValueError(n)
    return sum(terms), sum(abs(t) for t in terms)


@pytest.mark.parametrize("n", [0, 1, -1, 3, -3, 5, -5])
def test_z_reg_matches_mpmath_exact(n):
    """_z_reg (with the reference's Taylor switches at eps = 1e-2, 10
    terms) vs the exact closed form at 50 digits.  Checks both the
    exact-branch region and the switched regions, where the reference's
    own truncation error must stay below f64-relevant scale (the Taylor
    branches converge ~r^2 per term at |ln r| > ln 100)."""
    eps, terms = 1e-2, 10
    rs = [1e-6, 1e-3, 9.9e-3,          # Taylor branch (r < eps)
          1.01e-2, 0.1, 0.5, 0.999, 1.0, 1.001, 2.0, 10.0, 99.0,
          101.0, 1e3, 1e6]             # Taylor branch (r > 1/eps)
    for r in rs:
        got = _z_reg(n, r, eps, terms)
        want_mp, cond = _z_exact_mp(n, mp.mpf(r))
        want = float(want_mp)
        # tolerance scales with the formula's own term-magnitude sum: the
        # reference's exact branch cancels up to ~1e4 near r = 1/eps
        assert abs(got - want) < 2e-13 * max(float(cond), 1.0), \
            (n, r, got, want)


def test_coefficient_pack_matches_mpmath():
    """The full ga/gb/fh pack for a small config recomputed at 50 digits
    (mpmath loggamma end-to-end), INCLUDING the regularized family 1
    (Jreg: 2^{1.5+nu+alpha} magnitude and ln2*tau phase on the a-side,
    g_reg b-side, real Nyquist slot) and the Jn0 families 7..13."""
    cfg = SolverConfig(nk=16, np_factor=4)
    co = fastpt_coeffs(cfg)
    npts = cfg.nk * cfg.np_factor
    half = npts // 2
    dlnk = float(np.log(cfg.kmax / cfg.kmin) / (cfg.nk - 1))
    nu = cfg.nu_bias
    ln2 = mp.log(2)

    ELL_N = (0, 0, 1, 2, 2, 3, 4)
    ALPHA_N = (0, 2, 1, 0, 2, 1, 0)
    ELLN0_N = (0, 2, 4, 0, 2, 4, 6)
    ALPHAN0_N = (0, 0, 0, 2, 2, 2, 2)

    def tau(idx):
        return 2 * mp.pi * idx / (mp.mpf(dlnk) * npts)

    for fam in [0, 1, 4, 7, 10, 13]:
        if fam < 7:
            ell, alpha, beta = ELL_N[fam], ALPHA_N[fam], -ALPHA_N[fam]
        else:
            j = fam - 7
            ell, alpha, beta = ELLN0_N[j], ALPHAN0_N[j], 2
        reg = (ell == 0 and alpha == 2 and beta == -2)

        for m in (0, 1, half // 3, half - 1):
            ga = co.ga_re[fam, m] + 1j * co.ga_im[fam, m]
            gb = co.gb_re[fam, m] + 1j * co.gb_im[fam, m]
            if not reg:
                if m == 0 and alpha == ell - int(round(nu)):
                    want_a = mp.mpc(0)
                else:
                    g0, g1 = (_f_mp(nu, tau(m))
                              if (alpha == -2 and ell == 0)
                              else _g_mp(0.5 + ell, 1.5 + nu + alpha,
                                         tau(m)))
                    want_a = (g0 if m == 0
                              else g0 * mp.e ** (1j * g1))
                if m == 0 and beta == ell - int(round(nu)):
                    want_b = mp.mpc(0)
                else:
                    g0, g1 = (_f_mp(nu, tau(m))
                              if (beta == -2 and ell == 0)
                              else _g_mp(0.5 + ell, 1.5 + nu + beta,
                                         tau(m)))
                    want_b = (g0 if m == 0
                              else g0 * mp.e ** (1j * g1))
            else:
                if m == 0:
                    want_a = mp.mpc(0)
                else:
                    g0, g1 = _g_mp(0.5 + ell, 1.5 + nu + alpha, tau(m))
                    g0 *= mp.mpf(2) ** (1.5 + nu + alpha)
                    g1 += ln2 * tau(m)
                    want_a = g0 * mp.e ** (1j * g1)
                f0, f1 = _f_mp(nu, tau(m))
                want_b = (f0 * mp.cos(f1) if m == 0
                          else f0 * mp.e ** (1j * f1))
            for got, want in ((ga, want_a), (gb, want_b)):
                scale = max(abs(complex(want)), 1e-30)
                assert abs(got - complex(want)) < 1e-11 * max(scale, 1.0), \
                    (fam, m, got, complex(want))

        for h in (0, 1, npts // 2, npts):
            fh = co.fh_re[fam, h] + 1j * co.fh_im[fam, h]
            f0, f1 = _f_mp(-4.0 - 2.0 * nu - (alpha + beta), -tau(h))
            if not reg:
                ph = f1 + ln2 * tau(h)
                want = (f0 * mp.cos(f1) if h == 0
                        else f0 * mp.cos(ph) if h == npts
                        else f0 * mp.e ** (1j * ph))
            else:
                want = (f0 * mp.cos(f1) if h == 0
                        else f0 if h == npts
                        else f0 * mp.e ** (1j * f1))
            scale = max(abs(complex(want)), 1e-30)
            assert abs(fh - complex(want)) < 1e-11 * max(scale, 1.0), \
                (fam, h, fh, complex(want))
