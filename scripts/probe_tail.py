#!/usr/bin/env python
"""Decompose the non-engine tail of the full-TRG RHS and test rewrites.

The Omega-contraction einsums ("bgk,acdgefk->acdbefk" etc.) contract a
length-2 axis; on this runtime they cost more than the whole FAST-PT
engine.  Probe each candidate formulation.
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

from redtime_tpu import assembly  # noqa: E402

CH, NK, NELL = 8, 128, 3


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


rng = np.random.default_rng(1)
O = jnp.asarray(rng.standard_normal((CH, 2, 2, NK)))
I14 = jnp.asarray(rng.standard_normal((CH, 14, NK)))
A6v = jnp.asarray(rng.standard_normal((CH, 2, 2, 2, 2, 2, 2, NK)))
Qv = jnp.asarray(rng.standard_normal((CH, NELL, 2, 2, 2, NK)))
ee = jnp.asarray(rng.standard_normal((CH,)))


def tail_einsum(O, I14, A6, Q, e_eta):
    Ifull = assembly.expand64(I14).reshape(2, 2, 2, 2, 2, 2, NK)
    t1 = jnp.einsum("bgk,acdgefk->acdbefk", O, Ifull)
    t2 = jnp.einsum("egk,acdbgfk->acdbefk", O, Ifull)
    t3 = jnp.einsum("fgk,acdbegk->acdbefk", O, Ifull)
    dI_full = 2.0 * e_eta * A6 - (t1 + t2 + t3)
    dI = dI_full.reshape(64, NK)[jnp.asarray(assembly.JU)]
    q1 = jnp.einsum("adk,ldbck->labck", O, Q)
    q2 = jnp.einsum("bdk,ladck->labck", O, Q)
    q3 = jnp.einsum("cdk,labdk->labck", O, Q)
    dQ = 2.0 * e_eta * jnp.zeros_like(Q) - (q1 + q2 + q3)
    return dI.sum() + dQ.sum()


def contract2(O, X, axis):
    """sum_g O[., g] X[..., g at axis, ...] -> same shape, length-2 axis.

    Written as explicit slice-multiply-add: the contracted axis has length
    2, so this is 2 broadcast multiplies + 1 add on the VPU, with no
    dot_general lowering."""
    X0 = jax.lax.index_in_dim(X, 0, axis, keepdims=False)
    X1 = jax.lax.index_in_dim(X, 1, axis, keepdims=False)
    # O: [2, 2, NK]; result axis `axis` gets O's first index
    out0 = O[0, 0] * X0 + O[0, 1] * X1
    out1 = O[1, 0] * X0 + O[1, 1] * X1
    return jnp.stack([out0, out1], axis=axis)


def tail_slice(O, I14, A6, Q, e_eta):
    Ifull = assembly.expand64(I14).reshape(2, 2, 2, 2, 2, 2, NK)
    t1 = contract2(O, Ifull, 3)
    t2 = contract2(O, Ifull, 4)
    t3 = contract2(O, Ifull, 5)
    dI_full = 2.0 * e_eta * A6 - (t1 + t2 + t3)
    dI = dI_full.reshape(64, NK)[jnp.asarray(assembly.JU)]
    q1 = contract2(O, Q, 1 + 0)  # Q [l, a, b, c, k]: contract a/b/c
    # careful: contract2 assumes O's second index matches the sliced axis
    q1 = contract2(O, Q, 1)
    q2 = contract2(O, Q, 2)
    q3 = contract2(O, Q, 3)
    dQ = 2.0 * e_eta * jnp.zeros_like(Q) - (q1 + q2 + q3)
    return dI.sum() + dQ.sum()


def tail_gatherfree(O, I14, A6, Q, e_eta):
    """Like tail_slice but the final JU selection via static take."""
    Ifull = assembly.expand64(I14).reshape(2, 2, 2, 2, 2, 2, NK)
    t1 = contract2(O, Ifull, 3)
    t2 = contract2(O, Ifull, 4)
    t3 = contract2(O, Ifull, 5)
    dI_full = 2.0 * e_eta * A6 - (t1 + t2 + t3)
    rows = [dI_full.reshape(64, NK)[int(j)] for j in assembly.JU]
    dI = jnp.stack(rows)
    q1 = contract2(O, Q, 1)
    q2 = contract2(O, Q, 2)
    q3 = contract2(O, Q, 3)
    dQ = 2.0 * e_eta * jnp.zeros_like(Q) - (q1 + q2 + q3)
    return dI.sum() + dQ.sum()


for name, fn in [("einsum", tail_einsum), ("slice", tail_slice),
                 ("gatherfree", tail_gatherfree)]:
    f = jax.jit(jax.vmap(fn))
    dt, out = timed(f, O, I14, A6v, Qv, ee)
    print(f"{name:11s} {dt*1e3:8.2f} ms  checksum {float(out.sum()):.6e}")

# expand64 alone
f = jax.jit(jax.vmap(lambda x: assembly.expand64(x).sum()))
dt, _ = timed(f, I14)
print(f"expand64    {dt*1e3:8.2f} ms")
