"""Double-double (two-f32) arithmetic vs numpy f64 (redtime_tpu.dd).

The dd helpers back the Pallas-fused engine kernels: every primitive must
reproduce f64 arithmetic to ~1e-14 relative on wide dynamic ranges."""

import jax.numpy as jnp
import numpy as np

from redtime_tpu import dd

RNG = np.random.default_rng(7)


def _wide(shape, lo=-15, hi=15):
    return (RNG.standard_normal(shape)
            * np.exp(RNG.uniform(lo, hi, shape)))


def _dd(x):
    return dd.from_f64(jnp.asarray(x))


def _back(pair):
    return np.asarray(dd.to_f64(*pair))


def test_from_to_roundtrip():
    # an (f32, f32) pair carries ~49 mantissa bits (24 + 24 + sign gap),
    # not f64's 53 — same representation class as the TPU runtime's own
    # emulated f64.  Roundtrip is ~2^-48-relative, not exact.
    x = _wide((64,))
    got = _back(_dd(x))
    rel = np.abs(got - x) / np.abs(x)
    assert rel.max() < 2.0 ** -47


def test_add_mul_accuracy():
    a, b = _wide((256,)), _wide((256,))
    ah, al = _dd(a)
    bh, bl = _dd(b)
    rel_add = np.abs(_back(dd.add(ah, al, bh, bl)) - (a + b)) / \
        np.maximum(np.abs(a + b), 1e-300)
    rel_mul = np.abs(_back(dd.mul(ah, al, bh, bl)) - (a * b)) / \
        np.abs(a * b)
    assert rel_add.max() < 2e-13
    assert rel_mul.max() < 2e-13


def test_mul_f32_and_pow2():
    a = _wide((128,))
    ah, al = _dd(a)
    c = np.float32(1.7)
    got = _back(dd.mul_f32(ah, al, c))
    rel = np.abs(got - a * float(c)) / np.abs(a * float(c))
    assert rel.max() < 2e-13
    # power-of-two scaling is exact on the dd REPRESENTATION (compare
    # against the roundtripped value, which drops f64 bits 50..53)
    a_dd = _back((ah, al))
    sh, sl = dd.scale_pow2(ah, al, np.float32(0.25))
    assert np.array_equal(_back((sh, sl)), a_dd * 0.25)


def test_accumulation_chain():
    """Chained dd sums of cancelling terms stay ~1e-13 of the true f64."""
    terms = _wide((64, 512), lo=-3, hi=12)
    ref = terms.astype(np.float64).sum(axis=1)
    h = jnp.zeros(64, jnp.float32)
    l = jnp.zeros(64, jnp.float32)
    for j in range(terms.shape[1]):
        th, tl = _dd(terms[:, j])
        h, l = dd.add(h, l, th, tl)
    err = np.abs(_back((h, l)) - ref)
    scale = np.abs(terms).sum(axis=1)
    assert (err / scale).max() < 1e-13


def test_from_i32_exact():
    o = jnp.asarray(RNG.integers(-2**31 + 1, 2**31 - 1, 4096), jnp.int32)
    got = _back(dd.from_i32(o))
    assert np.array_equal(got, np.asarray(o, np.float64))


def test_exp2i_exact():
    e = jnp.arange(-125, 128, dtype=jnp.int32)
    got = np.asarray(dd.exp2i(e), np.float64)
    assert np.array_equal(got, 2.0 ** np.arange(-125, 128, dtype=np.float64))
    inv = np.asarray(dd.inv_pow2(jnp.arange(-125, 126, dtype=jnp.int32)),
                     np.float64)
    assert np.array_equal(inv, 2.0 ** -np.arange(-125, 126,
                                                 dtype=np.float64))
