"""Background expansion history: w(a), E(a), Y(a), H^2/H0^2, dlnH/dlna.

Pure functions of (CosmoParams, a) — trivially vmappable over a cosmology
batch.  Semantics follow the reference `AU_cosmological_parameters.h:394-500`
(CPL dark energy, photon radiation from T_cmb, massive neutrinos with an
abrupt hot->cold transition at a_nu).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from redtime_tpu.config import C_NU_HOT, C_RHO_GAM, CosmoParams


class DerivedParams(NamedTuple):
    """Derived density parameters (reference AU_cosmological_parameters.h:
    342-349)."""

    Omega_gam: jnp.ndarray   # photon density Og
    f_nu: jnp.ndarray
    f_cb: jnp.ndarray
    Omega_nu_hot: jnp.ndarray
    a_nu: jnp.ndarray        # hot->cold transition scale factor
    Omega_r: jnp.ndarray
    Omega_L: jnp.ndarray


def derived(c: CosmoParams) -> DerivedParams:
    Og = C_RHO_GAM * c.T_cmb ** 4 / (c.h * c.h)
    f_nu = c.Omega_nu / c.Omega_m
    f_cb = 1.0 - f_nu
    On_hot = C_NU_HOT * Og
    a_nu = C_NU_HOT * Og / (f_nu * c.Omega_m + 1e-15)
    Or = Og + On_hot * (a_nu > 1.0)
    OL = 1.0 - c.Omega_m - Or
    return DerivedParams(Og, f_nu, f_cb, On_hot, a_nu, Or, OL)


def w_de(c: CosmoParams, a):
    """CPL dark-energy equation of state (reference :395)."""
    return c.w0 + c.wa * (1.0 - a)


def E_de(c: CosmoParams, a):
    """rho_DE(a)/rho_DE(1) (reference :406-413)."""
    return a ** (-3.0 * (1.0 + c.w0 + c.wa)) * jnp.exp(-3.0 * c.wa * (1.0 - a))


def dE_da(c: CosmoParams, a):
    return 3.0 * E_de(c, a) * (c.wa - (1.0 + c.w0 + c.wa) / a)


def Y_nu(c: CosmoParams, a, d: DerivedParams | None = None):
    """rho_nu(a)/rho_cb(a): cold fraction for a >= a_nu, hot ~1/a below
    (reference :428-445)."""
    d = derived(c) if d is None else d
    cold = d.f_nu / d.f_cb
    hot = C_NU_HOT * d.Omega_gam / (d.f_cb * c.Omega_m * a)
    return jnp.where(a >= d.a_nu, cold, hot)


def dY_da(c: CosmoParams, a, d: DerivedParams | None = None):
    d = derived(c) if d is None else d
    hot = -C_NU_HOT * d.Omega_gam / (d.f_cb * c.Omega_m * a * a)
    return jnp.where(a >= d.a_nu, 0.0, hot)


def H2_H02(c: CosmoParams, a, d: DerivedParams | None = None):
    """(H/H0)^2 (reference :461-468)."""
    d = derived(c) if d is None else d
    return (d.f_cb * c.Omega_m * (1.0 + Y_nu(c, a, d)) / a ** 3
            + d.Omega_L * E_de(c, a) + d.Omega_gam / a ** 4)


def H_H0(c: CosmoParams, a, d: DerivedParams | None = None):
    return jnp.sqrt(H2_H02(c, a, d))


def dlnH_dlna(c: CosmoParams, a, d: DerivedParams | None = None):
    """(reference :480-485)."""
    d = derived(c) if d is None else d
    return 0.5 * a / H2_H02(c, a, d) * (
        d.f_cb * c.Omega_m * (-3.0 * (1.0 + Y_nu(c, a, d)) + a * dY_da(c, a, d))
        / a ** 4
        + d.Omega_L * dE_da(c, a) - 4.0 * d.Omega_gam / a ** 5)


def Omega_m_a(c: CosmoParams, a, d: DerivedParams | None = None):
    """Time-dependent Omega_m(a) (reference :497-500)."""
    return c.Omega_m / (a ** 3 * H2_H02(c, a, d))


# --- range-bounded forms for deep-radiation-era evaluation -----------------
# XLA:TPU emulates f64 as an f32 pair, inheriting f32's EXPONENT range:
# values beyond ~1e38 become inf (measured on the axon v5e: 1e80 -> inf,
# 1e-60 -> 0).  H2_H02 contains Og/a^4, which overflows below a ~ 1e-10 —
# the growth ODE integrates from a_early = 1e-20 (reference :696-697), so
# its RHS must be built from a^4 H^2/H0^2, which stays in [Og, ~1] on
# a in (0, 1.1].  Same physics as :461-485, different factorization.

def a4H2_H02(c: CosmoParams, a, d: DerivedParams | None = None):
    """s(a) = a^4 (H/H0)^2, bounded on (0, 1.1]."""
    d = derived(c) if d is None else d
    # f_cb Om (1+Y) a: the hot branch's Y*a is the constant Cnu*Og/(f_cb Om)
    Ya = jnp.where(a >= d.a_nu, d.f_nu / d.f_cb * a,
                   C_NU_HOT * d.Omega_gam / (d.f_cb * c.Omega_m))
    cb = d.f_cb * c.Omega_m * (a + Ya)
    # OL E_de a^4 = OL exp((1 - 3(w0+wa)) ln a - 3 wa (1-a)); the combined
    # exponent stays mild for physical (w0, wa) even when a^{-3(1+w0+wa)}
    # alone would overflow
    de = d.Omega_L * jnp.exp((1.0 - 3.0 * (c.w0 + c.wa)) * jnp.log(a)
                             - 3.0 * c.wa * (1.0 - a))
    return cb + de + d.Omega_gam


def dlnH_dlna_bounded(c: CosmoParams, a, d: DerivedParams | None = None):
    """dlnH/dlna = (dln s/dlna - 4)/2 with s = a^4 H^2/H0^2; equals
    dlnH_dlna (:480-485) but evaluates safely down to a_early."""
    d = derived(c) if d is None else d
    s = a4H2_H02(c, a, d)
    dYa = jnp.where(a >= d.a_nu, d.f_nu / d.f_cb * a, 0.0)
    dcb = d.f_cb * c.Omega_m * (a + dYa)
    de = d.Omega_L * jnp.exp((1.0 - 3.0 * (c.w0 + c.wa)) * jnp.log(a)
                             - 3.0 * c.wa * (1.0 - a))
    dde = de * (1.0 - 3.0 * (c.w0 + c.wa) + 3.0 * c.wa * a)
    return 0.5 * ((dcb + dde) / s - 4.0)
