#!/usr/bin/env python
"""Probe: shared-ramp + batched-system growth build vs the per-k build.

Round-3 restructure of build_growth_tables (model.py): the a_early ->
a_min ramp is k-independent (the reference's own Beta clamp for a < 1e-3,
AU_cosmological_parameters.h:148) and is integrated ONCE per model; the
table region advances the whole [n_lnk+1, 2] state under a single
controller, sharing the transcendental-heavy background scalars across
lanes.  This probe reproduces the superseded per-k formulation (one
vmapped integration per k node, each with its own ramp and controller)
and reports:

  * raw and NORMALIZED table deviations on the bundled massive-nu
    example (normalized = what growth_D_f consumes),
  * build_growth_tables and prepare_model wall time on a 16-chunk
    Mira-Titan design batch (the bench pipeline's prep unit).

Measured (CPU backend, 1-core host, 2026-08-18):
  raw rel dev: G 7.3e-7, dDda 1.9e-6 (common-scale; cancels normalized)
  normalized dev, z<=5 rows: 2.8e-12; worst early row (a=a_min): 7.3e-7
  build_growth_tables 16-chunk: 147.7 -> 15.4 ms (9.23 -> 0.96 ms/model)
  prepare_model 16-chunk: 21.2 ms (1.32 ms/model; was ~0.24 s)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
cpu = jax.devices("cpu")[0]
jax.config.update("jax_default_device", cpu)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _example_inputs  # noqa: E402
from redtime_tpu import design, driver, model as mdl  # noqa: E402
from redtime_tpu.config import CosmoParams, SolverConfig  # noqa: E402
from redtime_tpu.io import read_params_file  # noqa: E402
from redtime_tpu.io.camb import load_from_params  # noqa: E402
from redtime_tpu.ode import DOP853, DOPRI5, integrate_interval  # noqa: E402

EXAMPLE = "/root/reference/examples/1_redTime"


def build_per_k(cfg, c, lin):
    """The superseded round-2 formulation: vmap of independent per-k
    integrations, each with its own a_early ramp and controller."""
    from redtime_tpu import background as bg
    d = bg.derived(c)
    f_nu = c.Omega_nu / c.Omega_m
    lna_nodes, lnk_nodes = mdl.growth_nodes(cfg)
    k_nodes = np.exp(lnk_nodes)
    kq = np.clip(k_nodes, cfg.beta_k_min, cfg.beta_k_max)
    beta_cols = mdl._beta_reduce_k(lin, kq)
    rtol = cfg.growth_rtol

    def one_k(beta_col):
        def rhs(x, y):
            return mdl._growth_rhs(c, d, f_nu, jnp.asarray(lin.beta_a),
                                   beta_col, x, y)

        y0 = jnp.array([1.0, 1.0])
        x_early, x_min = np.log(cfg.a_early), np.log(cfg.growth_a_min)
        ramp_tab = DOP853 if cfg.growth_ramp_tableau == "dop853" else DOPRI5
        y, h = integrate_interval(rhs, x_early, x_min, y0, 1e-6,
                                  0.0, rtol, ramp_tab)
        first = y

        def seg(carry, xx):
            y, h = carry
            h0 = 1e-6 if cfg.growth_h_reset else h
            y2, h2 = integrate_interval(rhs, xx[0], xx[1], y, h0,
                                        0.0, rtol, DOPRI5)
            return (y2, h2), y2

        segs = jnp.stack([jnp.asarray(lna_nodes[:-1]),
                          jnp.asarray(lna_nodes[1:])], axis=1)
        _, rows = jax.lax.scan(seg, (y, h), segs)
        return jnp.concatenate([first[None, :], rows], axis=0)

    if beta_cols.shape[0] == 0:
        beta_cols_T = jnp.zeros((len(k_nodes), 0))
    else:
        beta_cols_T = beta_cols.T
    tabs = jax.vmap(one_k)(beta_cols_T)
    return lna_nodes, tabs[:, :, 0].T, tabs[:, :, 1].T


def main():
    p = read_params_file(f"{EXAMPLE}/params_redTime.dat")
    lin = load_from_params(p, EXAMPLE)
    cfg = SolverConfig()
    c = CosmoParams.make(p.n_s, p.sigma_8, p.h, p.Omega_m, p.Omega_b,
                         p.Omega_nu, p.T_cmb, p.w0, p.wa)

    lna, G_o, dD_o = jax.jit(lambda c, l: build_per_k(cfg, c, l))(c, lin)
    _, G_n, dD_n = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg, c, l))(c, lin)
    G_o, dD_o, G_n, dD_n = map(np.asarray, (G_o, dD_o, G_n, dD_n))

    print("raw rel dev: G %.3e  dDda %.3e" %
          (np.abs(G_n / G_o - 1).max(), np.abs(dD_n / dD_o - 1).max()))
    Gn_o, Gn_n = G_o / G_o[-1:, :], G_n / G_n[-1:, :]
    reln = np.abs(Gn_n / Gn_o - 1.0)
    late = np.exp(np.asarray(lna)) >= 1.0 / 6.0
    print("normalized dev: z<=5 rows %.3e, all rows %.3e" %
          (reln[late].max(), reln.max()))

    rows = design.models_from_unit_cube(design.latin_hypercube(16, seed=42))

    def dc(row):
        om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
        return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h**2,
                                Omega_b=om_b / h**2, Omega_nu=om_nu / h**2,
                                T_cmb=2.726, w0=w0, wa=wa)

    lin_s = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[dc(r) for r in rows])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin_s] * 16))

    for name, fn in [("per-k", build_per_k),
                     ("shared", mdl.build_growth_tables)]:
        gt = jax.jit(jax.vmap(lambda c, l: fn(cfg, c, l)))
        r = gt(cosmos, lins)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(5):
            r = gt(cosmos, lins)
            jax.block_until_ready(r)
        dt = (time.time() - t0) / 5
        print(f"{name:6s} build_growth_tables 16-chunk: {dt*1e3:.1f} ms "
              f"({dt/16*1e3:.2f} ms/model)")

    prep = driver._jitted_prepare(cfg, True)
    r = prep(cosmos, lins)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(5):
        r = prep(cosmos, lins)
        jax.block_until_ready(r)
    dt = (time.time() - t0) / 5
    print(f"prepare_model 16-chunk: {dt*1e3:.1f} ms "
          f"({dt/16*1e3:.2f} ms/model)")


if __name__ == "__main__":
    main()
