"""Double-double (two-float32) arithmetic for Pallas TPU kernels.

XLA:TPU's "f64" is itself an emulated f32 pair, but Pallas/Mosaic kernels
cannot take f64 operands at all — a fused kernel must carry the hi/lo
pair explicitly and do its own error-free arithmetic.  These helpers
implement the standard Dekker/Knuth error-free transforms on f32 arrays
(no FMA assumption: Dekker splitting at 2^12+1 for the 24-bit mantissa),
giving ~1e-14-relative products/sums — the same accuracy class as the
runtime's emulated f64 (measured: scripts/probe_pallas.py probe3).

All functions work identically on plain jnp arrays (CPU tests) and on
values loaded from Pallas refs.  A DD value is just a (hi, lo) tuple of
f32 arrays with hi = fl(hi + lo).

The reference solver is all C double (e.g. `src/redTime.cc` passim);
these helpers exist so the TPU hot path can fuse its double-precision
pipeline into single Mosaic kernels instead of per-op emulated-f64 HLOs.
Production consumer: `fastpt._oz_split_rows` builds its exact
power-of-two slice scales with `inv_pow2` (the Ozaki legs' activation
split); the full arithmetic layer backs the Pallas kernel route probed
in scripts/probe_pallas.py (measured 1.05x XLA — kept as the substrate
for future fused kernels, docs/TPU_NOTES.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)        # 2^12 + 1 (Dekker split for f32)
F32 = jnp.float32


def two_sum(a, b):
    """Knuth two-sum: a + b = s + e exactly (any magnitudes)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Dekker two-sum requiring |a| >= |b|: a + b = s + e exactly."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Dekker two-product: a * b = p + e exactly (f32, no FMA)."""
    p = a * b
    aa = a * _SPLIT
    ahi = aa - (aa - a)
    alo = a - ahi
    bb = b * _SPLIT
    bhi = bb - (bb - b)
    blo = b - bhi
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def add(ah, al, bh, bl):
    """DD + DD -> DD (accurate variant, ~1 ulp of dd)."""
    sh, se = two_sum(ah, bh)
    tl, te = two_sum(al, bl)
    se = se + tl
    sh, se = fast_two_sum(sh, se)
    se = se + te
    return fast_two_sum(sh, se)


def add_f32(ah, al, b):
    """DD + f32 -> DD."""
    sh, se = two_sum(ah, b)
    se = se + al
    return fast_two_sum(sh, se)


def mul(ah, al, bh, bl):
    """DD * DD -> DD."""
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return fast_two_sum(p, e)


def mul_f32(ah, al, b):
    """DD * f32 -> DD."""
    p, e = two_prod(ah, b)
    e = e + al * b
    return fast_two_sum(p, e)


def scale_pow2(ah, al, s):
    """DD * s for s an exact power of two (exact, componentwise)."""
    return ah * s, al * s


def neg(ah, al):
    return -ah, -al


def from_f64(x):
    """f64 array -> (hi, lo) f32 pair (XLA side, outside the kernel)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(ah, al):
    """(hi, lo) -> f64 (XLA side, outside the kernel)."""
    return ah.astype(jnp.float64) + al.astype(jnp.float64)


def from_i32(o):
    """int32 -> DD exactly (for MXU int32 accumulator outputs: hi keeps
    the top 24 bits, the residual fits f32 exactly)."""
    hi = o.astype(F32)
    lo = (o - hi.astype(jnp.int32)).astype(F32)
    return hi, lo


def exp2i(e_i32):
    """2^e for integer e in [-125, 127], EXACT, via exponent bit-casting
    (jnp.exp2 lowers through pow and is ~1e-8 off on TPU)."""
    biased = (e_i32 + 127) << 23
    return jax.lax.bitcast_convert_type(biased.astype(jnp.int32),
                                        jnp.float32)


def inv_pow2(e_i32):
    """2^-e for integer e in [-125, 125], exact."""
    return exp2i(-e_i32)
