"""The FFT-log engine's unregularized J transforms must agree with the
direct continuum quadrature (quadrature.j_quadrature) — an independent
check that the engine approximates the true mode-coupling integrals,
with no shared discretization conventions (SURVEY section 7.6(b))."""

import jax.numpy as jnp
import numpy as np
import pytest

from redtime_tpu import fastpt, quadrature
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids


@pytest.fixture(scope="module")
def engine_J():
    """Engine J on a realistic smooth spectrum (BBKS-like shape with the
    solver's own extension + window)."""
    cfg = SolverConfig()
    g = make_grids(cfg)
    # smooth CDM-like spectrum: P ~ k^ns T^2(k) with a BBKS transfer
    k = np.asarray(g.k)
    q = k / 0.15
    T = (np.log(1 + 2.34 * q) / (2.34 * q)
         / (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
            + (6.71 * q) ** 4) ** 0.25)
    P = 4.0e6 * k ** 0.96 * T * T
    lnP3 = jnp.broadcast_to(jnp.log(jnp.asarray(P)), (3, g.nk))
    ec = fastpt.engine_consts(cfg, "fft")
    P_ext = np.asarray(fastpt.extend_power(cfg, lnP3, 0.96, ec))[0]
    Jw, _, _ = fastpt.compute_J_PZ_windowed(
        cfg, jnp.asarray(np.broadcast_to(P_ext, (3, g.npts))), True,
        "fft", ec)
    return cfg, g, P_ext, np.asarray(Jw)


@pytest.mark.parametrize("fam,alpha,beta,ell", quadrature.UNREG_FAMILIES)
def test_engine_matches_continuum(engine_J, fam, alpha, beta, ell):
    cfg, g, P_ext, Jw = engine_J
    idx = np.array([24, 48, 72, 96])          # mid solver-grid columns
    # n_q=600: the beta=-2 families need fine ln-q resolution near the
    # s->0 endpoint (x->1) to converge below the engine's own
    # discretization error
    jq = quadrature.j_quadrature(cfg, P_ext, np.asarray(g.k)[idx],
                                 alpha, beta, ell, n_q=600, n_x=96)
    jf = Jw[fam, 0, 0][idx]
    peak = np.abs(Jw[fam, 0, 0]).max()
    # residual = remaining GL endpoint resolution + the engine's FFT-log
    # discretization (measured to shrink to 5e-5 of peak at nk=256)
    assert np.abs(jq - jf).max() <= 5e-3 * peak


def test_quadrature_converges(engine_J):
    """Doubling the GL orders moves family 0 by < 1e-4 of peak (the
    quadrature itself is converged; the engine gap is discretization)."""
    cfg, g, P_ext, Jw = engine_J
    k = np.asarray(g.k)[[48]]
    a = quadrature.j_quadrature(cfg, P_ext, k, 0, 0, 0, 400, 64)
    b = quadrature.j_quadrature(cfg, P_ext, k, 0, 0, 0, 800, 128)
    peak = np.abs(Jw[0, 0, 0]).max()
    assert np.abs(a - b).max() <= 1e-4 * peak


@pytest.mark.parametrize("fi,n", list(enumerate(fastpt.Z_N)))
def test_pz_matches_continuum(engine_J, fi, n):
    """The PZ Toeplitz contraction matches the 1D continuum Z-kernel
    integral.  Negative-n kernels (IR-weighted) agree to ~2e-3 of peak;
    positive-n kernels are UV-window dominated, where the engine's
    grid-sample sum and the GL quadrature of the log-log-linear
    interpolant resolve the few-point taper differently (~2.5% of peak,
    n-independent — a discretization difference, not a convention
    error, which would be O(1))."""
    cfg, g, P_ext, _ = engine_J
    ec = fastpt.engine_consts(cfg, "fft")
    _, _, PZw = fastpt.compute_J_PZ_windowed(
        cfg, jnp.asarray(np.broadcast_to(P_ext, (3, g.npts))), True,
        "fft", ec)
    PZw = np.asarray(PZw)
    idx = np.array([24, 48, 72, 96])
    Pk = P_ext[g.nshift:g.nshift + g.nk]
    pq = quadrature.pz_quadrature(cfg, P_ext, np.asarray(g.k)[idx],
                                  n) * Pk[idx]
    pf = PZw[fi, 0, 0][idx]
    peak = np.abs(PZw[fi, 0, 0]).max()
    tol = 3e-3 if n < 0 else 4e-2
    assert np.abs(pq - pf).max() <= tol * peak
