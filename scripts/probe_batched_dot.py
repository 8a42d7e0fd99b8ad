#!/usr/bin/env python
"""Lowering variants for the fused output contraction
t[B,f,a,b,o] = sum_h prod[B,f,a,b,h] M[f,h,o]   (B=8, f=14, ab=9,
h=1024, o=129; 133 MMAC) — the batched f64 dot_general runs at 0.065
TMAC/s in the solver loop. Probe alternatives in-loop."""

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

B, F, AB, H, O = 8, 14, 9, 1024, 129
N_ITER = 50


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


rng = np.random.default_rng(0)
Mnp = rng.standard_normal((F, H, O))
M = jnp.asarray(Mnp)
Mcat = jnp.asarray(np.concatenate([Mnp[f] for f in range(F)], axis=1))
x0 = jnp.asarray(rng.standard_normal((B, F, AB, H)))
macs = B * F * AB * H * O


def renorm(x, t):
    return x * 0.999 + 1e-9 * t.sum() * jnp.ones_like(x)


def v_einsum(x):
    t = jnp.einsum("bfah,fho->bfao", x, M)
    return renorm(x, t)


def v_vmap_einsum(x):
    t = jax.vmap(lambda xx: jnp.einsum("fah,fho->fao", xx, M))(x)
    return renorm(x, t)


def v_loop(x):
    outs = [x[:, f] @ M[f] for f in range(F)]
    t = jnp.stack(outs, axis=1)
    return renorm(x, t)


def v_fmajor(x):
    # arrange f-major before the batched dot
    xt = jnp.transpose(x, (1, 0, 2, 3)).reshape(F, B * AB, H)
    t = jax.lax.dot_general(xt, M, (((2,), (1,)), ((0,), (0,))))
    return renorm(x, t)


def v_onedot_waste(x):
    # one flat dot with cross-family waste: [B*AB? no — flatten (b,a) rows
    # and (f,h) cols] @ [F*H, F*O] block-diagonal
    xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * AB, F * H)
    BD = jnp.asarray(np.zeros((F * H, F * O)))
    t = xt @ BD
    return renorm(x, t)


def v_shared_roundtrip(x):
    # shared rfft-style dot + elementwise + shared restricted dot
    FCFS = jnp.asarray(rng.standard_normal((H, H // 2 + 1)))
    Bco = jnp.asarray(rng.standard_normal((H // 2 + 1, O)))
    fh = jnp.asarray(rng.standard_normal((F, H // 2 + 1)))
    c = x.reshape(B * F * AB, H) @ FCFS
    cf = c.reshape(B, F, AB, H // 2 + 1) * fh[None, :, None, :]
    t = cf.reshape(B * F * AB, H // 2 + 1) @ Bco
    return renorm(x, t)


variants = [("batched einsum", v_einsum), ("vmap einsum", v_vmap_einsum),
            ("14-dot loop", v_loop), ("f-major dot_general", v_fmajor),
            ("shared roundtrip(2x macs)", v_shared_roundtrip)]
for name, fn in variants:
    dt = inloop_time(fn, x0)
    print(f"{name:26s} {dt*1e3:7.2f} ms  {macs/dt/1e12:6.3f} TMAC/s(nominal)")
