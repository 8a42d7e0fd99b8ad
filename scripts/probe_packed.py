#!/usr/bin/env python
"""Packed-scheduler diagnostics: solve-only time + while iterations vs
the chunked scheduler, over lane counts."""

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

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import driver, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

N = int(os.environ.get("PROBE_N", "32"))
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def main():
    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(N)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * N))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ms = driver._jitted_prepare(cfg, True)(
            jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)

    for lanes in (8,):
        f = jax.jit(lambda m, e, ln=lanes: trg.evolve_packed(
            cfg, settings, m, ln, mode, e, return_iters=True))
        out, it = f(ms, ec)
        jax.block_until_ready(out)
        t0 = time.time()
        out, it = f(ms, ec)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"packed lanes={lanes:2d}: {dt:6.3f}s solve-only "
              f"({N/dt*60:6.1f}/min)  iters={int(it)}")


if __name__ == "__main__":
    main()
