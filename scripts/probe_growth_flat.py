#!/usr/bin/env python
"""Validate + time the flat node-stopped growth integration and the
8th-order (DOP853) a_early ramp against the round-2 scan-of-intervals path.

Checks:
  1. bit-exactness: integrate_nodes (flat, DOPRI5 ramp) vs the round-2
     scan of integrate_interval segments — must agree to the last ulp;
  2. dop853 ramp trajectory deviation (expected ~1e-9 relative on the
     normalized D tables — both integrators sit on the true solution);
  3. wall time of build_growth_tables under each option (chunk of 16);
  4. ramp attempt counts dopri5 vs dop853.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
cpu = jax.devices("cpu")[0]
jax.config.update("jax_default_device", cpu)


import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_inputs
from redtime_tpu import background as bg
from redtime_tpu import design
from redtime_tpu import model as mdl
from redtime_tpu.config import CosmoParams, SolverConfig
from redtime_tpu.ode import DOP853, DOPRI5, integrate_interval

CHUNK = 16


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def timeit(fn, n=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.time() - t0) / n, r


def build_scan_r2(cfg, c, lin):
    """The round-2 default path verbatim: dopri5 ramp + scan of
    node-stopped integrate_interval segments, h carried."""
    d = bg.derived(c)
    f_nu = c.Omega_nu / c.Omega_m
    lna_nodes, lnk_nodes = mdl.growth_nodes(cfg)
    kq = np.clip(np.exp(lnk_nodes), cfg.beta_k_min, cfg.beta_k_max)
    beta_cols = mdl._beta_reduce_k(lin, kq)
    rtol = cfg.growth_rtol

    def one_k(beta_col):
        def rhs(x, y):
            return mdl._growth_rhs(c, d, f_nu, jnp.asarray(lin.beta_a),
                                   beta_col, x, y)
        y0 = jnp.array([1.0, 1.0])
        x_early, x_min = np.log(cfg.a_early), np.log(cfg.growth_a_min)
        y, h = integrate_interval(rhs, x_early, x_min, y0, 1e-6,
                                  0.0, rtol, DOPRI5)
        first = y

        def seg(carry, xx):
            y, h = carry
            y2, h2 = integrate_interval(rhs, xx[0], xx[1], y, h,
                                        0.0, rtol, DOPRI5)
            return (y2, h2), y2

        segs = jnp.stack([jnp.asarray(lna_nodes[:-1]),
                          jnp.asarray(lna_nodes[1:])], axis=1)
        _, rows = jax.lax.scan(seg, (y, h), segs)
        return jnp.concatenate([first[None, :], rows], axis=0)

    tabs = jax.vmap(one_k)(beta_cols.T)
    return lna_nodes, tabs[:, :, 0].T, tabs[:, :, 1].T


def main():
    cfg5 = SolverConfig(growth_ramp_tableau="dopri5")
    cfg8 = SolverConfig(growth_ramp_tableau="dop853")
    lin = _example_inputs(cfg5)
    rows = design.models_from_unit_cube(design.latin_hypercube(CHUNK, seed=42))
    cosmos = [_design_cosmo(r) for r in rows]
    cb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cosmos)
    lb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * CHUNK))

    # 1. bit-exactness of the flat loop (ode.integrate_nodes, dopri5
    # ramp folded in) vs the r2 scan-of-intervals
    from redtime_tpu.ode import integrate_nodes
    import redtime_tpu.background as bgm

    def build_flat(cfg, c, lin):
        d = bgm.derived(c)
        f_nu = c.Omega_nu / c.Omega_m
        lna_nodes, lnk_nodes = mdl.growth_nodes(cfg)
        kq = np.clip(np.exp(lnk_nodes), cfg.beta_k_min, cfg.beta_k_max)
        beta_cols = mdl._beta_reduce_k(lin, kq)

        def one_k(beta_col):
            def rhs(x, y):
                return mdl._growth_rhs(c, d, f_nu, jnp.asarray(lin.beta_a),
                                       beta_col, x, y)
            rows, _ = integrate_nodes(rhs, np.log(cfg.a_early),
                                      jnp.asarray(lna_nodes),
                                      jnp.array([1.0, 1.0]), 1e-6, 0.0,
                                      cfg.growth_rtol, DOPRI5)
            return rows
        tabs = jax.vmap(one_k)(beta_cols.T)
        return lna_nodes, tabs[:, :, 0].T, tabs[:, :, 1].T

    c0 = cosmos[0]
    _, G_scan, dD_scan = jax.jit(
        lambda c, l: build_scan_r2(cfg5, c, l))(c0, lin)
    _, G_flat, dD_flat = jax.jit(
        lambda c, l: build_flat(cfg5, c, l))(c0, lin)
    same_G = np.array_equal(np.asarray(G_scan), np.asarray(G_flat))
    same_dD = np.array_equal(np.asarray(dD_scan), np.asarray(dD_flat))
    print(f"flat vs r2-scan bit-exact: G {same_G}, dDda {same_dD}")
    if not (same_G and same_dD):
        dg = np.max(np.abs(G_flat / G_scan - 1.0))
        print(f"  max rel dev G: {dg:.3e}")

    # 2. dop853 ramp deviation on the NORMALIZED tables (what downstream
    # consumes: growth_D_f divides by the lna=0 row)
    _, G8, dD8 = jax.jit(
        lambda c, l: mdl.build_growth_tables(cfg8, c, l))(c0, lin)
    Gn5 = np.asarray(G_flat) / np.asarray(G_flat)[-1:]
    Gn8 = np.asarray(G8) / np.asarray(G8)[-1:]
    dev = np.max(np.abs(Gn8 / Gn5 - 1.0))
    dn5 = np.asarray(dD_flat) / np.asarray(G_flat)[-1:]
    dn8 = np.asarray(dD8) / np.asarray(G8)[-1:]
    devd = np.max(np.abs(dn8 / dn5 - 1.0))
    print(f"dop853 ramp: normalized-table dev G {dev:.3e}, dDda {devd:.3e}")

    # 3. wall time (vmapped chunk of 16).  Measured verdicts (1-core host):
    #    the flat integrate_nodes lowering of the table region is
    #    bit-exact but NO faster than the scan (run-to-run noise swamps
    #    the loop-setup savings), so build_growth_tables keeps the scan;
    #    the dop853 ramp is the real win (~2x fewer ramp attempts).
    for name, cfg in (("dop853 ramp + scan (default)", cfg8),
                      ("dopri5 ramp + scan", cfg5)):
        gt = jax.jit(jax.vmap(
            lambda c, l: mdl.build_growth_tables(cfg, c, l)))
        dt, _ = timeit(lambda: gt(cb, lb))
        print(f"build_growth_tables [{name}] chunk={CHUNK}: "
              f"{dt*1e3:.1f} ms ({dt/CHUNK*1e3:.2f} ms/model)")
    gt_scan = jax.jit(jax.vmap(lambda c, l: build_scan_r2(cfg5, c, l)))
    dt, _ = timeit(lambda: gt_scan(cb, lb))
    print(f"build_growth_tables [r2 scan, inline] chunk={CHUNK}: "
          f"{dt*1e3:.1f} ms ({dt/CHUNK*1e3:.2f} ms/model)")

    # 4. ramp attempt counts
    d = bg.derived(c0)
    f_nu = c0.Omega_nu / c0.Omega_m
    _, lnk_nodes = mdl.growth_nodes(cfg5)
    kq = np.clip(np.exp(lnk_nodes), cfg5.beta_k_min, cfg5.beta_k_max)
    beta_cols = mdl._beta_reduce_k(lin, kq)

    for name, tab in (("dopri5", DOPRI5), ("dop853", DOP853)):
        def ramp(beta_col):
            def rhs(x, y):
                return mdl._growth_rhs(c0, d, f_nu, jnp.asarray(lin.beta_a),
                                       beta_col, x, y)
            y0 = jnp.array([1.0, 1.0])
            _, _, n = integrate_interval(
                rhs, np.log(cfg5.a_early), np.log(cfg5.growth_a_min), y0,
                1e-6, 0.0, cfg5.growth_rtol, tab, return_stats=True)
            return n
        ns = jax.jit(jax.vmap(ramp))(beta_cols.T)
        print(f"ramp attempts [{name}]: max {int(np.max(ns))} "
              f"mean {float(np.mean(ns)):.0f}")


if __name__ == "__main__":
    main()
