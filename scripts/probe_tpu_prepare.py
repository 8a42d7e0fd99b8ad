#!/usr/bin/env python
"""Probe: does prepare_model (growth while_loop) run on the TPU device?

Round-1 state: the raw-variable f64 growth integration (state ~ 1/a_early
= 1e20) reproducibly crashed the TPU worker; prepare ran on host as a
workaround.  The scaled-state formulation keeps the state O(1) — this
probe checks whether the fault is gone.  Run stages separately; a hung
stage means the tunnel is wedging and the caller's timeout should kill us.

Usage: python scripts/probe_tpu_prepare.py [health|tiny|full|solve_fused]
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import model as mdl  # noqa: E402
from redtime_tpu.config import SolverConfig  # noqa: E402


def health():
    x = jax.jit(lambda x: x * 2 + 1)(jnp.ones(8)).block_until_ready()
    print("health OK", jax.devices()[0], float(x[0]))


def tiny():
    cfg = SolverConfig(growth_n_lna=10, growth_n_lnk=6, quad_panels=8,
                       quad_order=8)
    m = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(
        _cosmo(), _example_inputs(cfg))
    jax.block_until_ready(m)
    print("tiny prepare OK on", jax.devices()[0].platform,
          "D(0) finite:", bool(jnp.all(jnp.isfinite(m.g_Dnorm))))


def full():
    import numpy as np
    cfg = SolverConfig()
    c, lin = _cosmo(), _example_inputs(cfg)
    m = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(c, lin)
    jax.block_until_ready(m)
    D, _ = mdl.growth_D_f(m, 0.0)
    print("full prepare OK on", jax.devices()[0].platform,
          "max|D(0)-1| =", float(np.max(np.abs(np.asarray(D) - 1.0))))
    # numerical parity vs the host-CPU f64 tables (emulated f64 on TPU is
    # ~1e-9-accurate in pow/exp; growth bar is 1e-6 vs golden)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        m_cpu = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(
            jax.device_put(c, cpu), jax.device_put(lin, cpu))
        jax.block_until_ready(m_cpu)
    worst = 0.0
    paths_a = jax.tree_util.tree_leaves_with_path(m)
    leaves_b = jax.tree_util.tree_leaves(m_cpu)
    for (path, a), b in zip(paths_a, leaves_b):
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0 or a.dtype.kind not in "fc":
            continue
        rel = np.max(np.abs(a - b) / (np.abs(b) + 1e-300))
        worst = max(worst, rel)
        print(f"  {jax.tree_util.keystr(path):24s} "
              f"max rel dev vs CPU: {rel:.2e}")
    print("worst table deviation TPU-vs-CPU:", f"{worst:.2e}")


if __name__ == "__main__":
    {"health": health, "tiny": tiny, "full": full}[sys.argv[1]]()
