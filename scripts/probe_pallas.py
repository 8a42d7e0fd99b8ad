#!/usr/bin/env python
"""Feasibility probe: does Pallas/Mosaic work on the axon TPU runtime?

Tests, in order:
  1. trivial elementwise VPU kernel (f32)
  2. int8 MXU dot with int32 accumulation (the Ozaki building block)
  3. double-double (two-f32) elementwise arithmetic via Dekker splitting
  4. in-loop timing of a fused splits+dot kernel vs the XLA lowering
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def probe1():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.allclose(np.asarray(out), np.asarray(x) * 2 + 1)
    print("probe1 elementwise f32: OK")


def probe2():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    a = rng.integers(-64, 64, (128, 512)).astype(np.int8)
    b = rng.integers(-64, 64, (512, 256)).astype(np.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.int32) @ b.astype(np.int32)
    assert np.array_equal(np.asarray(out), ref), "int8 dot mismatch"
    print("probe2 int8 MXU dot -> int32: OK (exact)")


def probe3():
    """Double-double product via Dekker splitting inside a kernel."""
    SPLIT = np.float32(4097.0)  # 2^12 + 1 for f32 (24-bit mantissa)

    def two_prod(a, b):
        p = a * b
        aa = a * SPLIT
        ahi = aa - (aa - a)
        alo = a - ahi
        bb = b * SPLIT
        bhi = bb - (bb - b)
        blo = b - bhi
        err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
        return p, err

    def kernel(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
        ah, al = ah_ref[:], al_ref[:]
        bh, bl = bh_ref[:], bl_ref[:]
        p, e = two_prod(ah, bh)
        e = e + (ah * bl + al * bh)
        s = p + e
        oh_ref[:] = s
        ol_ref[:] = e - (s - p)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 128)) * np.exp(rng.uniform(-8, 8, (8, 128)))
    y = rng.standard_normal((8, 128)) * np.exp(rng.uniform(-8, 8, (8, 128)))
    xh = x.astype(np.float32)
    xl = (x - xh).astype(np.float32)
    yh = y.astype(np.float32)
    yl = (y - yh).astype(np.float32)
    oh, ol = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(*map(jnp.asarray, (xh, xl, yh, yl)))
    got = np.asarray(oh).astype(np.float64) + np.asarray(ol)
    rel = np.abs(got / (x * y) - 1.0)
    print(f"probe3 dd product: max rel err {rel.max():.2e} "
          f"({'OK' if rel.max() < 1e-13 else 'FAIL'})")


def probe4():
    """In-loop cost: fused (split + int8 dot + scale-sum) pallas kernel
    vs the same math lowered through XLA (emulated f64 + separate ops).
    Shapes mimic the out leg at chunk 16: x [2016, 1024] f64 ->
    8 int8 slices -> 4 diagonal dots vs [1024, 129]-ish weights."""
    M, K, O = 2016, 1024, 256
    rng = np.random.default_rng(2)
    x = rng.standard_normal((M, K))
    W8 = [rng.integers(-64, 64, (K, O)).astype(np.int8) for _ in range(4)]

    q = 7
    SA = 6

    # --- XLA reference path (mimics _oz_split_rows + diagonal dots)
    @jax.jit
    def xla_path(x, ws):
        ah = x.astype(jnp.float32)
        al = (x - ah.astype(x.dtype)).astype(jnp.float32)
        mx = jnp.max(jnp.abs(ah), axis=-1, keepdims=True)
        ex = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-38))) + 2.0
        exi = jnp.clip(ex, -125.0, 125.0).astype(jnp.int32)
        inv = jax.lax.bitcast_convert_type(
            ((127 - exi) << 23).astype(jnp.int32), jnp.float32)
        r = ah * inv
        tot = None
        for i in range(SA):
            sc = np.float32(2.0 ** (q * (i + 1)))
            t = jnp.round(r * sc)
            r = r - t / sc
            if i == 2:
                r = r + al * inv
            o = jax.lax.dot_general(
                t.astype(jnp.int8), ws[i % 4], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            c = o.astype(jnp.float64) * (2.0 ** (-q * (i + 2)))
            tot = c if tot is None else tot + c
        return tot * (1.0 / inv.astype(jnp.float64))

    # --- pallas fused path
    def kernel(xh_ref, xl_ref, w0, w1, w2, w3, oh_ref, ol_ref):
        ah, al = xh_ref[:], xl_ref[:]
        mx = jnp.max(jnp.abs(ah), axis=-1, keepdims=True)
        ex = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-38))) + 2.0
        exi = jnp.clip(ex, -125.0, 125.0).astype(jnp.int32)
        inv = pltpu.bitcast(((127 - exi) << 23).astype(jnp.int32),
                            jnp.float32)
        r = ah * inv
        ws = [w0, w1, w2, w3]
        toth = jnp.zeros((ah.shape[0], w0.shape[1]), jnp.float32)
        totl = jnp.zeros((ah.shape[0], w0.shape[1]), jnp.float32)
        for i in range(SA):
            sc = np.float32(2.0 ** (q * (i + 1)))
            t = jnp.round(r * sc)
            r = r - t / sc
            if i == 2:
                r = r + al * inv
            o = jax.lax.dot_general(
                t.astype(jnp.int8), ws[i % 4][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # int32 -> dd f32 (exact): hi rounds, residual int fits f32
            ch = o.astype(jnp.float32)
            cl = (o - ch.astype(jnp.int32)).astype(jnp.float32)
            s = np.float32(2.0 ** (-q * (i + 2)))
            ch, cl = ch * s, cl * s
            # dd add (toth, totl) += (ch, cl)  [Knuth two-sum on hi]
            sh = toth + ch
            v = sh - toth
            e = (toth - (sh - v)) + (ch - v) + totl + cl
            toth = sh + e
            totl = e - (toth - sh)
        # undo the row balancing (inv is an exact power of two, so the
        # dd pair scales exactly)
        unscale = pltpu.bitcast(
            ((exi + 127) << 23).astype(jnp.int32), jnp.float32)
        oh_ref[:] = toth * unscale
        ol_ref[:] = totl * unscale

    TM = 288  # row tile (2016 / 7, divisible by 8); per-tile VMEM ~7 MB

    @jax.jit
    def pallas_path(xh, xl, ws):
        # Pallas grids fail Mosaic legalization ('func.return') when traced
        # under x64 (i64 index maps); trace the call in x32 — operands are
        # f32/int8 anyway (docs/TPU_NOTES.md)
        with jax.enable_x64(False):
            oh, ol = pl.pallas_call(
                kernel,
                grid=(M // TM,),
                out_shape=(jax.ShapeDtypeStruct((M, O), jnp.float32),) * 2,
                in_specs=[pl.BlockSpec((TM, K), lambda i: (i, 0))] * 2 +
                         [pl.BlockSpec((K, O), lambda i: (0, 0))] * 4,
                out_specs=(pl.BlockSpec((TM, O), lambda i: (i, 0)),) * 2,
            )(xh, xl, *ws)
        return oh, ol

    xj = jnp.asarray(x)
    wj = [jnp.asarray(w) for w in W8]
    ref = xla_path(xj, wj)
    jax.block_until_ready(ref)
    xh = jnp.asarray(x.astype(np.float32))
    xl = jnp.asarray((x - x.astype(np.float32)).astype(np.float32))
    oh, ol = pallas_path(xh, xl, wj)
    jax.block_until_ready((oh, ol))
    got = np.asarray(oh).astype(np.float64) + np.asarray(ol)
    refn = np.asarray(ref)
    # the two paths share the slice math except the final scale ordering;
    # xl vs al*inv handling differs in rounding at ~2^-53
    scale = np.abs(refn).max()
    print(f"probe4 fused-vs-XLA result agreement: "
          f"{np.abs(got - refn).max() / scale:.2e} of max")

    def inloop(fn, *args, n=30, reps=3):
        rest = args[1:]

        @jax.jit
        def run(a0):
            def body(i, c):
                r = fn(c, *rest)
                if isinstance(r, tuple):
                    r = r[0].astype(jnp.float64) + r[1].astype(jnp.float64)
                return c * 0.999 + 1e-30 * r[:, :K] if r.shape[1] >= K \
                    else c * 0.999 + 1e-30 * jnp.pad(
                        r, ((0, 0), (0, K - r.shape[1])))
            return jax.lax.fori_loop(0, n, body, a0)

        out = run(args[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (reps * n)

    t_xla = inloop(lambda c, ws: xla_path(c, ws), xj, wj)
    t_pal = inloop(
        lambda c, ws: pallas_path(c.astype(jnp.float32),
                                  (c - c.astype(jnp.float32)
                                   .astype(jnp.float64)).astype(jnp.float32),
                                  ws), xj, wj)
    print(f"probe4 in-loop: XLA {t_xla*1e3:.3f} ms  "
          f"pallas {t_pal*1e3:.3f} ms  speedup {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for p in (probe1, probe2, probe3, probe4):
        try:
            p()
        except Exception as e:
            print(f"{p.__name__} FAILED: {type(e).__name__}: {e}")
            break
