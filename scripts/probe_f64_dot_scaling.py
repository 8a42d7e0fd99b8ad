#!/usr/bin/env python
"""Cost model of the emulated-f64 dot on this runtime: sweep M, K, N
around the engine's hot shapes and report in-loop ms per dot.  Also
times the standalone elementwise ops the radix path adds (flip/concat/
twiddle) to see what offsets the MAC savings."""

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


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")
    shapes = [
        (8064, 1024, 1026),   # c-dot radix=1 (batch 8 flattened)
        (16128, 512, 514),    # c-dot radix=2
        (32256, 256, 258),    # c-dot radix=4
        (8064, 1024, 514),    # halve N only
        (8064, 512, 1026),    # halve K only
        (4032, 1024, 1026),   # halve M only
        (2016, 1024, 1026),   # quarter M
        (8064, 1026, 129),    # t-dot
        (672, 512, 1024),     # tab-dot (batch 8: 2*14*3*8)
        (1008, 1024, 1026),   # probe_ozaki's shape for cross-check
    ]
    for M, K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)))
        B = jnp.asarray(rng.standard_normal((K, N)))

        def step(c, B=B):
            t = c @ B
            return c.at[:, :1].add(1e-12 * t[:, :1])

        dt = inloop_time(step, x)
        macs = M * K * N
        print(f"  [{M:6d},{K:5d}]@[{K:5d},{N:5d}]: {dt*1e3:7.3f} ms  "
              f"{macs/dt/1e12:6.3f} TMAC/s")

    # elementwise radix-path extras at engine scale
    f = jnp.asarray(rng.standard_normal((8, 14, 3, 3, 4, 129)))
    tw = jnp.asarray(rng.standard_normal((4, 513)))

    def step_mirror(c):
        fre = c
        m = 256
        pre = jnp.concatenate([fre, jnp.flip(fre[..., 1:m // 2], -1)], -1)
        ere = jnp.concatenate([pre, pre] + [fre[..., :1]], -1)
        out = (ere * tw).sum(-2)
        return c + 1e-12 * out[..., None, :129]

    dt = inloop_time(step_mirror, f)
    print(f"  mirror+twiddle combine ([8,126,4,129] base): {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
