#!/usr/bin/env python
"""Probe matmul schemes for the DFT engine on the live accelerator.

The full-TRG hot path is f64 matmuls (XLA:TPU emulates f64 dot via a
while-loop at ~0.33 TMAC/s).  Candidate replacements must deliver BOTH
raw speed and ~<=1e-11 relative accuracy (the eta controller rejects
steps when engine noise exceeds ~1e-9 on small I-components).

Schemes probed, on the engine-representative shape
[ROWS, N] @ [N, N//2+1] (ROWS = 126 transforms x chunk, N = 4*nk):

  f64        jnp.dot on f64 (the current production primitive)
  f32hi      f32 dot, precision 'highest' (6-pass bf16)
  bf16       bf16 dot, f32 accumulation (preferred_element_type)
  df2x3      double-float: hi/lo f32 split, 3 dots at 'highest'
  ozaki<S>   integer-slice (Ozaki) scheme: S slices of the row-scaled
             mantissa per operand, int8 x int8 -> int32 exact dots,
             triangular pair sum (i+j < S), f64 recombine

Also times K chained dots in one jit to separate fixed per-dot cost
from MAC throughput.
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BITS = 7  # mantissa bits per int8 slice (product 14 bits; 512-sum fits i32)


def ozaki_split(x, n_slices: int, axis: int):
    """Split f64 x into n_slices int8 mantissa slices + per-row f64 scale.

    Rows (all elements sharing the reduction axis position vary; scale is
    per-vector along `axis`): s = 2^ceil(log2(max|x|)) so x/s in (-1, 1].
    Slice k holds bits [k*BITS, (k+1)*BITS) below the leading bit.
    """
    ax_max = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    ax_max = jnp.where(ax_max == 0, 1.0, ax_max)
    e = jnp.ceil(jnp.log2(ax_max))
    scale = jnp.exp2(e)
    r = x / scale                       # in [-1, 1]
    slices = []
    for _ in range(n_slices):
        r = r * (1 << BITS)
        q = jnp.round(r)
        slices.append(q.astype(jnp.int8))
        r = r - q
    return jnp.stack(slices), scale     # [S, ...], scale broadcastable


def ozaki_dot(a, b, n_slices: int):
    """[M,K] @ [K,N] f64 via integer slices with exact i32 accumulation."""
    sa, ka = ozaki_split(a, n_slices, axis=1)   # ka: [M,1]
    sb, kb = ozaki_split(b, n_slices, axis=0)   # kb: [1,N]
    out = jnp.zeros(a.shape[:1] + b.shape[1:], jnp.float64)
    # pair (i, j) contributes 2^{-BITS*(i+j+2)}; keep i+j < n_slices
    for s in range(n_slices):
        acc = jnp.zeros_like(out, jnp.int32)
        for i in range(s + 1):
            j = s - i
            acc = acc + jax.lax.dot(sa[i], sb[j],
                                    preferred_element_type=jnp.int32)
        out = out + acc.astype(jnp.float64) * (2.0 ** (-BITS * (s + 2)))
    return out * ka * kb


def df_split(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def df_dot(a, b):
    ah, al = df_split(a)
    bh, bl = df_split(b)
    with jax.default_matmul_precision("highest"):
        hh = jax.lax.dot(ah, bh, preferred_element_type=jnp.float32)
        hl = jax.lax.dot(ah, bl, preferred_element_type=jnp.float32)
        lh = jax.lax.dot(al, bh, preferred_element_type=jnp.float32)
    return (hh.astype(jnp.float64) + (hl.astype(jnp.float64)
                                      + lh.astype(jnp.float64)))


def time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1008)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    M, K = args.rows, args.n
    N = K // 2 + 1
    # engine-like magnitudes: windowed P * k^-nu spans ~6 decades
    a_np = (rng.standard_normal((M, K))
            * np.exp(rng.uniform(-7, 7, (M, K)))).astype(np.float64)
    jj = np.arange(K)
    mm = np.arange(N)
    b_np = np.cos(2 * np.pi * np.outer(jj, mm) / K)

    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    ref = a_np @ b_np
    ref_scale = np.max(np.abs(ref), axis=1, keepdims=True)

    macs = M * K * N

    def report(name, dt, out):
        out = np.asarray(out, np.float64)
        rel = np.max(np.abs(out - ref) / ref_scale)
        print(f"{name:10s} {dt*1e3:9.3f} ms  {macs/dt/1e12:7.3f} TMAC/s  "
              f"maxrel(row-scaled) {rel:9.2e}")

    schemes = {
        "f64": jax.jit(lambda x, y: jax.lax.dot(x, y)),
        "f32hi": jax.jit(lambda x, y: jax.lax.dot(
            x.astype(jnp.float32), y.astype(jnp.float32),
            precision="highest")),
        "bf16": jax.jit(lambda x, y: jax.lax.dot(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)),
        "df2x3": jax.jit(df_dot),
    }
    for s in (4, 6, 8, 9):
        schemes[f"ozaki{s}"] = jax.jit(
            lambda x, y, s=s: ozaki_dot(x, y, s))

    for name, fn in schemes.items():
        try:
            dt, out = time_fn(fn, a, b)
            report(name, dt, out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # fixed-cost probe: K chained f64 dots in one jit
    print("\nchained-dot fixed-cost probe (f64):")
    for k in (1, args.chain):
        @jax.jit
        def chained(x, y, k=k):
            acc = x
            for _ in range(k):
                acc = jax.lax.dot(acc, y @ y.T) / jnp.max(jnp.abs(acc))
            return acc
        dt, _ = time_fn(chained, a, b, reps=5)
        print(f"  {k} dots: {dt*1e3:9.3f} ms  ({dt/k*1e3:.3f} ms/dot)")

    print("\nchained-dot fixed-cost probe (ozaki8 splits amortized):")

    @jax.jit
    def chained_oz(x, y):
        sb, kb = ozaki_split(y, 8, axis=0)
        acc = jnp.zeros((x.shape[0], y.shape[1]))
        for _ in range(4):
            acc = acc + ozaki_dot(x, y, 8)
        return acc
    dt, _ = time_fn(chained_oz, a, b, reps=5)
    print(f"  4 ozaki8 dots: {dt*1e3:9.3f} ms ({dt/4*1e3:.3f} ms/dot)")


if __name__ == "__main__":
    main()
