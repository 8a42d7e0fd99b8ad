#!/usr/bin/env python
"""Probe: dense-output growth integration vs the node-stopped scan.

Measures (host CPU): table agreement, controller attempts, and the wall
time of a 16-wide vmapped prepare_model — the prep-floor quantity from
docs/TPU_NOTES.md ("The prep floor").
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import model as mdl  # noqa: E402
from redtime_tpu.config import SolverConfig  # noqa: E402
import dataclasses  # noqa: E402


def tables(cfg, c, lin):
    f = jax.jit(lambda c, l: mdl.build_growth_tables(cfg, c, l))
    out = f(c, lin)
    jax.block_until_ready(out)
    return out


def time_prepare(cfg, n=16, reps=3):
    cs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i % 8) for i in range(n)])
    lin = _example_inputs(cfg)
    lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * n))
    f = jax.jit(jax.vmap(lambda c, l: mdl.prepare_model(cfg, c, l)))
    jax.block_until_ready(f(cs, lins))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(cs, lins))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    cfg0 = SolverConfig(growth_dense=True)
    cfg_scan = dataclasses.replace(cfg0, growth_dense=False)
    c, lin = _cosmo(), _example_inputs(cfg0)

    # truth: scan path at tight rtol (the documented ~1e-9 trajectory)
    cfg_ref = dataclasses.replace(cfg_scan, growth_rtol=1e-10)
    _, G_r, dD_r = tables(cfg_ref, c, lin)
    G_r, dD_r = np.asarray(G_r), np.asarray(dD_r)

    for label, cfg in [
        ("scan  rtol 1e-6", cfg_scan),
        ("dense rtol 1e-6", cfg0),
        ("dense rtol 1e-7", dataclasses.replace(cfg0, growth_rtol=1e-7)),
        ("dense rtol 1e-8", dataclasses.replace(cfg0, growth_rtol=1e-8)),
        ("dense rtol 1e-9", dataclasses.replace(cfg0, growth_rtol=1e-9)),
    ]:
        _, G, dD = tables(cfg, c, lin)
        rel_G = np.max(np.abs(np.asarray(G) / G_r - 1.0))
        rel_dD = np.max(np.abs(np.asarray(dD) / dD_r - 1.0))
        t = time_prepare(cfg)
        print(f"{label}: err G {rel_G:.2e} dDda {rel_dD:.2e}  "
              f"prepare16 {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
