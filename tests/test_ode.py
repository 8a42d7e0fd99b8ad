"""Adaptive RK integrator tests: exact solutions and scipy cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from redtime_tpu.ode import DOPRI5, RKF45, integrate_interval


def test_exponential_decay():
    def rhs(t, y):
        return -y

    y0 = jnp.array([1.0, 2.0])
    for tab, tol in ((RKF45, (1e-10, 1e-10)), (DOPRI5, (1e-10, 1e-10))):
        y, h = integrate_interval(rhs, 0.0, 3.0, y0, 0.01, *tol, tab)
        assert np.allclose(np.asarray(y), np.exp(-3.0) * np.array([1., 2.]),
                           rtol=1e-8)


def test_oscillator_vs_scipy():
    def rhs(t, y):
        return jnp.array([y[1], -y[0]])

    y0 = jnp.array([1.0, 0.0])
    y, _ = integrate_interval(rhs, 0.0, 10.0, y0, 0.01, 0.0, 1e-11, DOPRI5)
    ref = solve_ivp(lambda t, y: [y[1], -y[0]], (0, 10), [1, 0],
                    rtol=1e-12, atol=1e-12).y[:, -1]
    assert np.allclose(np.asarray(y), ref, atol=1e-8)


def test_boundary_hit_exact():
    # final clipped step must land exactly on t1
    def rhs(t, y):
        return jnp.ones_like(y)

    y, _ = integrate_interval(rhs, 0.0, 0.7777777, jnp.array([0.0]),
                              1.0, 1e-12, 1e-12, RKF45)
    assert np.isclose(float(y[0]), 0.7777777, rtol=0, atol=1e-15)


def test_loose_tolerance_controller_behaves():
    # stiff-ish decay with loose rel tolerance, mirrors TRG settings
    def rhs(t, y):
        return -10.0 * y

    y, _ = integrate_interval(rhs, 0.0, 2.0, jnp.array([1.0]), 0.02,
                              1e-7, 1e-2, RKF45)
    assert np.isclose(float(y[0]), np.exp(-20.0), rtol=0.05, atol=1e-8)


def test_jit_and_vmap():
    def rhs(t, y):
        return -y * t

    f = jax.jit(lambda y0: integrate_interval(rhs, 0.0, 2.0, y0, 0.01,
                                              0.0, 1e-10, DOPRI5)[0])
    ys = jax.vmap(f)(jnp.arange(1.0, 4.0)[:, None])
    assert np.allclose(np.asarray(ys[:, 0]),
                       np.arange(1.0, 4.0) * np.exp(-2.0), rtol=1e-8)
