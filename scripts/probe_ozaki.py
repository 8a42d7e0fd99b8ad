#!/usr/bin/env python
"""Ozaki-scheme f64 matmul via exact-accumulating bf16 MXU passes.

The emulated-f64 dot on this runtime lowers to a while-loop
(~0.33 TMAC/s flat, 0.065 batched).  The Ozaki splitting replaces one
f64 [M,K]@[K,N] with s_a*s_b bf16 matmuls whose partial products are
EXACT in the MXU's f32 accumulator: slice elements are q-bit integers
(q <= (24 - log2 K)/2) times powers of two, so every pairwise product
and its K-term sum is exactly representable in f32.  Recombination is
elementwise emulated-f64 (cheap).

Probes: (1) raw in-loop rate of bf16 dots at the engine's hot shape,
(2) accuracy of the Ozaki product vs true f64 (numpy), (3) in-loop
rate of the full Ozaki pipeline (split + matmuls + recombine) vs the
emulated f64 dot.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# engine hot shape: prod [B=8, f=14, ab=9, h=1024] @ M [1024, 1026]
M_, K_, N_ = 1008, 1024, 1026
N_ITER = 50
Q = 7          # bits per slice: (24 - log2(1024)) / 2 = 7


def inloop_time(step, y0, n=N_ITER, reps=3):
    @jax.jit
    def run(y):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), y)
    out = run(y0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * n)


def split_const(Bnp: np.ndarray, q: int, s: int):
    """Host-side split of a constant matrix into s bf16 integer slices.

    Returns (slices [s, K, N] bf16, scale float, unit exponents): the
    matrix is sum_j slices[j] * scale * 2^{-q(j+1)} + O(2^{-qs})."""
    amax = np.abs(Bnp).max()
    e = 2.0 ** np.ceil(np.log2(amax)) if amax > 0 else 1.0
    r = Bnp / e
    sl = []
    for j in range(s):
        t = np.round(r * 2.0 ** (q * (j + 1))) / 2.0 ** (q * (j + 1))
        sl.append((t * 2.0 ** (q * (j + 1))).astype(np.float32))
        r = r - t
    return np.stack(sl).astype(jnp.bfloat16), e


def split_act(x, q: int, s: int):
    """Device-side split of the activation along rows (last-axis contraction).

    x [M, K] f64 -> (slices [s, M, K] bf16, row scale [M, 1] f64)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    e = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))))
    r = x / e
    sls = []
    for i in range(s):
        sc = 2.0 ** (q * (i + 1))
        t = jnp.round(r * sc) / sc
        sls.append((t * sc).astype(jnp.bfloat16))
        r = r - t
    return jnp.stack(sls), e


def ozaki_matmul(x, Bsl, Be, q: int, sa: int, sb: int, cutoff=None):
    """x [M,K] f64 @ B [K,N] f64 via bf16 slice products.

    Bsl [sb,K,N] bf16 (host-split), Be scalar.  cutoff: keep slice pairs
    with i+j <= cutoff (None = all)."""
    xsl, xe = split_act(x, q, sa)
    M = x.shape[0]
    # one flat dot computing all sa*sb pair products
    A2 = xsl.reshape(sa * M, -1)
    B2 = jnp.moveaxis(Bsl, 0, 1).reshape(Bsl.shape[1], -1)  # [K, sb*N]
    P = jax.lax.dot_general(
        A2, B2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [sa*M, sb*N]
    P = P.reshape(sa, M, Bsl.shape[0], -1)                  # [sa,M,sb,N]
    out = jnp.zeros(P.shape[1:2] + P.shape[3:], jnp.float64)
    for i in range(sa):
        for j in range(sb):
            if cutoff is not None and i + j > cutoff:
                continue
            out = out + P[i, :, j].astype(jnp.float64) * (
                2.0 ** (-q * (i + j + 2)))
    return out * (xe * Be)


def main():
    rng = np.random.default_rng(0)
    # realistic operands: decaying coefficient spectra x DFT-like matrix
    Bnp = np.cos(np.outer(np.arange(K_), np.arange(N_)) * 0.001) * 2.0
    decay = np.exp(-np.linspace(0, 20, K_))[None, :]
    Xnp = rng.standard_normal((M_, K_)) * decay * 10.0 ** rng.integers(
        -3, 3, size=(M_, 1))
    ref = Xnp @ Bnp

    x = jnp.asarray(Xnp)
    Bf64 = jnp.asarray(Bnp)
    macs = M_ * K_ * N_

    print(f"backend={jax.default_backend()}  shape {M_}x{K_}x{N_} "
          f"({macs/1e6:.0f} MMAC)")

    # accuracy sweep
    for sa, sb, cut in [(8, 8, None), (8, 8, 8), (6, 6, None), (5, 5, None),
                        (4, 4, None), (3, 3, None)]:
        Bsl, Be = split_const(Bnp, Q, sb)
        Bsl = jnp.asarray(Bsl)
        got = np.asarray(jax.jit(
            lambda xx: ozaki_matmul(xx, Bsl, Be, Q, sa, sb, cut))(x))
        denom = np.abs(ref).max(axis=1, keepdims=True)
        err = np.abs(got - ref) / denom
        print(f"  ozaki s=({sa},{sb}) cut={cut}: max rel-to-rowmax err "
              f"{err.max():.3e}")

    # speed: emulated f64 dot
    def renorm(t):
        return x + 1e-12 * t[: M_, : K_]

    def step_f64(c):
        t = jax.lax.dot_general(c, Bf64, (((1,), (0,)), ((), ())))
        return renorm(t)

    dt = inloop_time(step_f64, x)
    print(f"  f64 dot      : {dt*1e3:8.3f} ms  {macs/dt/1e12:6.3f} TMAC/s")

    # speed: pure bf16 dot (upper bound)
    xb = x.astype(jnp.bfloat16)

    def step_bf16(c):
        t = jax.lax.dot_general(c, Bf64.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (c + 1e-12 * t[: M_, : K_].astype(jnp.bfloat16))

    dtb = inloop_time(step_bf16, xb)
    print(f"  bf16 dot     : {dtb*1e3:8.3f} ms  {macs/dtb/1e12:6.3f} TMAC/s")

    # speed: full ozaki pipeline at several slice counts
    for sa, sb, cut in [(8, 8, None), (6, 6, None), (5, 5, None),
                        (4, 4, None)]:
        Bsl, Be = split_const(Bnp, Q, sb)
        Bsl = jnp.asarray(Bsl)

        def step_oz(c, Bsl=Bsl, Be=Be, sa=sa, sb=sb, cut=cut):
            t = ozaki_matmul(c, Bsl, Be, Q, sa, sb, cut)
            return renorm(t)

        dto = inloop_time(step_oz, x)
        eff = macs / dto / 1e12
        print(f"  ozaki ({sa},{sb}) : {dto*1e3:8.3f} ms  {eff:6.3f} "
              f"TMAC/s-eq  ({dt/dto:4.1f}x vs f64 dot)")


if __name__ == "__main__":
    main()
