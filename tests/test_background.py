"""Background cosmology unit tests: closed forms and limits."""

import jax
import jax.numpy as jnp
import numpy as np

from redtime_tpu import background as bg
from redtime_tpu.config import C_NU_HOT, C_RHO_GAM, CosmoParams

LCDM = CosmoParams.make(n_s=0.96, sigma_8=0.8, h=0.7, Omega_m=0.3,
                        Omega_b=0.045, Omega_nu=0.0)
NU = CosmoParams.make(n_s=0.88, sigma_8=0.8056, h=0.73418,
                      Omega_m=0.286233679143621, Omega_b=0.0430930827493416,
                      Omega_nu=0.00576437405571056, w0=-1.2147, wa=-1.1120)


def test_derived_lcdm():
    d = bg.derived(LCDM)
    Og = C_RHO_GAM * 2.726 ** 4 / 0.49
    assert np.isclose(float(d.Omega_gam), Og, rtol=1e-12)
    assert float(d.f_nu) == 0.0
    assert float(d.f_cb) == 1.0
    # massless: a_nu huge -> neutrinos always "hot", included in Omega_r
    assert float(d.a_nu) > 1.0
    assert np.isclose(float(d.Omega_r), Og * (1 + C_NU_HOT), rtol=1e-12)
    assert np.isclose(float(d.Omega_L), 1.0 - 0.3 - float(d.Omega_r),
                      rtol=1e-12)


def test_E_lcdm_is_const():
    c = LCDM
    for a in (0.1, 0.5, 1.0):
        assert np.isclose(float(bg.E_de(c, a)), 1.0, rtol=1e-14)
        assert np.isclose(float(bg.dE_da(c, a)), 0.0, atol=1e-14)


def test_E_w0wa_closed_form():
    c = NU
    a = 0.37
    expected = a ** (-3 * (1 + c.w0 + c.wa)) * np.exp(-3 * c.wa * (1 - a))
    assert np.isclose(float(bg.E_de(c, a)), float(expected), rtol=1e-14)
    # derivative vs finite difference
    eps = 1e-7
    fd = (float(bg.E_de(c, a + eps)) - float(bg.E_de(c, a - eps))) / (2 * eps)
    assert np.isclose(float(bg.dE_da(c, a)), fd, rtol=1e-6)


def test_H2_late_time_lcdm():
    c = LCDM
    d = bg.derived(c)
    # at a=1: H^2/H0^2 = f_cb*Om*(1+Y) + OL + Og ~ 1 (flatness, Y folds the
    # hot-nu density into the matter term for massless nu)
    h2 = float(bg.H2_H02(c, 1.0))
    expect = 0.3 * (1 + float(bg.Y_nu(c, 1.0))) + float(d.Omega_L) + \
        float(d.Omega_gam)
    assert np.isclose(h2, expect, rtol=1e-14)


def test_dlnH_dlna_vs_fd():
    for c in (LCDM, NU):
        for a in (1e-3, 0.03, 0.9):
            eps = a * 1e-7
            fd = (np.log(float(bg.H2_H02(c, a + eps))) -
                  np.log(float(bg.H2_H02(c, a - eps)))) / \
                (2 * eps / a) / 2.0
            assert np.isclose(float(bg.dlnH_dlna(c, a)), fd, rtol=1e-5), \
                (float(c.Omega_nu), a)


def test_matter_dom_limit():
    # deep matter domination (but after a_nu): H^2 ~ Om/a^3
    c = LCDM
    a = 0.01
    h2 = float(bg.H2_H02(c, a))
    assert np.isclose(h2, 0.3 / a ** 3, rtol=0.05)
    # dlnH/dlna -> -3/2
    assert np.isclose(float(bg.dlnH_dlna(c, a)), -1.5, atol=0.05)


def test_vmap_over_cosmologies():
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), LCDM, NU)
    h2 = jax.vmap(lambda cc: bg.H2_H02(cc, 0.5))(batch)
    assert h2.shape == (2,)
    assert np.isclose(float(h2[0]), float(bg.H2_H02(LCDM, 0.5)))
    assert np.isclose(float(h2[1]), float(bg.H2_H02(NU, 0.5)))


def test_comoving_distance():
    # EdS-like sanity: H0*chi increases with z; matches direct quadrature
    from redtime_tpu.config import SolverConfig
    from redtime_tpu import model as M
    import scipy.integrate as si
    from redtime_tpu import background as bgmod

    cfg = SolverConfig()
    a_in = 1.0 / 201.0
    c = LCDM
    for z in (0.5, 3.0):
        eta = np.log((1.0 / (1.0 + z)) / a_in)
        got = float(M.h0_chi(cfg, c, a_in, eta))
        want, _ = si.quad(
            lambda zz: 1.0 / float(bgmod.H_H0(c, 1.0 / (1.0 + zz))), 0, z,
            epsrel=1e-10)
        assert np.isclose(got, want, rtol=1e-3), (z, got, want)
    # below z=1e-4 the reference returns z itself
    eta0 = np.log((1.0 / (1.0 + 5e-5)) / a_in)
    assert np.isclose(float(M.h0_chi(cfg, c, a_in, eta0)), 5e-5, rtol=1e-6)
