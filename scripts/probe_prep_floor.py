#!/usr/bin/env python
"""Profile the host-prep floor: where do prepare_model's milliseconds go?

The chunked batch pipeline's e2e ceiling is host prep (~0.285 s per
16-chunk at round 2, docs/TPU_NOTES.md) and 70% of that was attributed to
build_growth_tables.  This probe decomposes prep on the CPU backend:

  * whole _jitted_prepare(16-chunk) wall time (the bench's own unit),
  * growth tables alone (vmapped over the chunk),
  * growth ODE attempt counts, split ramp (a_early -> a_min) vs
    table region (a_min -> a_max) via integrate_interval return_stats,
  * the qag sigma8/sigma_v2 normalization alone.

Run on the CPU backend (JAX_PLATFORMS=cpu not honored here; uses
jax_default_device like tests/conftest.py).
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
from redtime_tpu import design, driver, model as mdl
from redtime_tpu.config import CosmoParams, SolverConfig
from redtime_tpu.ode import DOPRI5, integrate_interval

CHUNK = int(os.environ.get("PROBE_CHUNK", "16"))


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def timeit(fn, *args, n=5):
    fn(*args)  # warm/compile
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.time() - t0) / n, r


def main():
    cfg = SolverConfig()
    lin = _example_inputs(cfg)
    rows = design.models_from_unit_cube(design.latin_hypercube(CHUNK, seed=42))
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_design_cosmo(r) for r in rows])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * CHUNK))

    # 1. whole prepare (the bench's unit)
    prep = driver._jitted_prepare(cfg, True)
    dt, ms = timeit(lambda: prep(cosmos, lins))
    print(f"prepare_model chunk={CHUNK}: {dt*1e3:.1f} ms "
          f"({dt/CHUNK*1e3:.2f} ms/model)")

    # 2. growth tables alone
    gt = jax.jit(jax.vmap(lambda c, l: mdl.build_growth_tables(cfg, c, l)))
    dt_g, _ = timeit(lambda: gt(cosmos, lins))
    print(f"build_growth_tables chunk={CHUNK}: {dt_g*1e3:.1f} ms "
          f"({dt_g/CHUNK*1e3:.2f} ms/model) = {dt_g/dt*100:.0f}% of prep")

    # 3. attempt counts, ramp vs table, one representative model
    c0 = jax.tree_util.tree_map(lambda x: x[0], cosmos)
    from redtime_tpu import background as bg
    d = bg.derived(c0)
    f_nu = c0.Omega_nu / c0.Omega_m
    lna_nodes, lnk_nodes = mdl.growth_nodes(cfg)
    kq = np.clip(np.exp(lnk_nodes), cfg.beta_k_min, cfg.beta_k_max)
    beta_cols = mdl._beta_reduce_k(lin, kq)

    def stats_one(beta_col):
        def rhs(x, y):
            return mdl._growth_rhs(c0, d, f_nu, jnp.asarray(lin.beta_a),
                                   beta_col, x, y)
        y0 = jnp.array([1.0, 1.0])
        x_early, x_min = np.log(cfg.a_early), np.log(cfg.growth_a_min)
        y, h, n_ramp = integrate_interval(rhs, x_early, x_min, y0, 1e-6,
                                          0.0, cfg.growth_rtol, DOPRI5,
                                          return_stats=True)
        # table region: node-stopped scan (the default path)
        def seg(carry, xx):
            y, h, n = carry
            y2, h2, dn = integrate_interval(rhs, xx[0], xx[1], y, h,
                                            0.0, cfg.growth_rtol, DOPRI5,
                                            return_stats=True)
            return (y2, h2, n + dn), y2
        segs = jnp.stack([jnp.asarray(lna_nodes[:-1]),
                          jnp.asarray(lna_nodes[1:])], axis=1)
        (_, _, n_tab), _ = jax.lax.scan(seg, (y, h, jnp.array(0)), segs)
        return n_ramp, n_tab

    n_ramp, n_tab = jax.jit(jax.vmap(stats_one))(beta_cols.T)
    print(f"growth attempts/model: ramp max {int(np.max(n_ramp))} "
          f"(mean {float(np.mean(n_ramp)):.0f}), "
          f"table max {int(np.max(n_tab))} "
          f"(mean {float(np.mean(n_tab)):.0f})")

    # 4. qag normalization alone
    qn = jax.jit(jax.vmap(
        lambda c, l: mdl.sigma8_normalization_qag(cfg, c, l)))
    dt_q, _ = timeit(lambda: qn(cosmos, lins))
    print(f"sigma8_normalization_qag chunk={CHUNK}: {dt_q*1e3:.1f} ms "
          f"({dt_q/dt*100:.0f}% of prep)")
    sv = jax.jit(jax.vmap(
        lambda c, l, n: mdl.sigma_v2_z0_qag(cfg, c, l, n)))
    nrm = qn(cosmos, lins)
    dt_s, _ = timeit(lambda: sv(cosmos, lins, nrm))
    print(f"sigma_v2_z0_qag chunk={CHUNK}: {dt_s*1e3:.1f} ms "
          f"({dt_s/dt*100:.0f}% of prep)")

    # 5. beta reduction + transfer (the remaining pieces)
    def rest(c, l):
        import numpy as _np
        from redtime_tpu.grids import make_grids
        g = make_grids(cfg)
        kq = _np.clip(g.k, cfg.beta_k_min, cfg.beta_k_max)
        bs = mdl._beta_reduce_k(l, kq)
        T = mdl.transfer_at(c, l, jnp.asarray(g.lnk))
        return bs, T
    rj = jax.jit(jax.vmap(rest))
    dt_r, _ = timeit(lambda: rj(cosmos, lins))
    print(f"beta_reduce+transfer chunk={CHUNK}: {dt_r*1e3:.1f} ms "
          f"({dt_r/dt*100:.0f}% of prep)")


if __name__ == "__main__":
    main()
