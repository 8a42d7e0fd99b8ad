#!/usr/bin/env python
"""In-loop cost of each engine sub-stage (full-TRG RHS hot path).

Splits compute_mode_coupling_full into its pipeline stages and times each
inside a jitted fori_loop with a carry dependence (dispatch excluded),
to target the pallas fusion work.  Stages:
  extend   : extend_power (ext dot + bias + exp + window)
  fwd+coef : forward oz dot + kbias + gamma coefficient products -> sab
  tab      : oz tab leg (split + int8 diagonal dots) -> tab
  prod+out : pair products + oz out leg -> Jw
  pz       : oz PZ leg + outer factors
  assemble : A/R/PT/PMR static combos from J/PZ
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

from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402
from redtime_tpu import assembly, driver, fastpt, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import (NFAM, _oz_dot, _oz_q, _oz_sa,  # noqa: E402
                                _oz_split_rows, engine_consts)
from redtime_tpu.grids import make_grids  # noqa: E402

CH = int(os.environ.get("CH", "8"))
N_ITER = 50
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


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
    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    cfg = SolverConfig(fft_mode=mode)
    g = make_grids(cfg)
    npts, half, nk = g.npts, g.npts // 2, g.nk
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(CH)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * CH))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = driver._jitted_prepare(cfg, True)
        ms = prep(jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)
    settings = RunSettings(one_loop=False, z_out=Z_OUT)
    y0 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(ms)
    n_s = ms.cosmo.n_s

    def lnP_of(y):
        return y.reshape(CH, trg.NU_STATE, nk)[:, 0:3]

    def renorm(y):
        return y * 0.999 + y0 * 0.001

    def wrap(vals_to_dy):
        """vals_to_dy: y -> [CH, ...] tensor folded back into the carry."""
        def step(y):
            out = vals_to_dy(y)
            flat = out.reshape(CH, -1)
            pad = jnp.zeros((CH, y.shape[1]))
            pad = pad.at[:, :min(flat.shape[1], y.shape[1])].set(
                flat[:, :y.shape[1]])
            return renorm(y + 1e-12 * pad)
        return step

    # stage outputs captured once as constants for downstream-stage inputs
    P_ext0 = jax.jit(jax.vmap(
        lambda yy, nn: fastpt.extend_power(cfg, yy, nn, ec)))(
            jnp.exp(lnP_of(y0)) * 0 + lnP_of(y0), n_s)
    qf = min(_oz_q(npts), 7)

    def fwd_coef(P_e):
        ci = _oz_dot(P_e * ec.kbias, ec.oz_f_diags, ec.oz_f_scale,
                     ec.oz_f_row, qf, _oz_sa(qf), -(-53 // qf))
        ca_re, ca_im = ci[..., :half], ci[..., half:]

        def coeff(gr, gi):
            sr, si = fastpt._cmul(ca_re[:, None], ca_im[:, None],
                                  gr[:NFAM, None], gi[:NFAM, None])
            return jnp.concatenate([sr, si], axis=-1)

        return jnp.stack([coeff(ec.ga_re, ec.ga_im),
                          coeff(ec.gb_re, ec.gb_im)], axis=1)

    sab0 = jax.jit(fwd_coef)(P_ext0)

    q2 = min(_oz_q(npts), 7)
    sa2 = _oz_sa(q2)
    sb2 = -(-53 // q2)

    def tab_leg(sab):
        rows = 2 * NFAM * 3
        n2 = 2 * npts
        xsl, xe = _oz_split_rows(sab, q2, sa2)
        x8 = xsl.astype(jnp.int8).reshape((sa2, CH * rows, npts))
        tot = jnp.zeros((CH * rows, n2), sab.dtype)
        for d, rhs in enumerate(ec.oz_b_diags):
            iis = [i for i in range(sa2) if 0 <= d - i < sb2]
            lhs = jnp.concatenate([x8[i] for i in iis], axis=-1)
            o = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32)
            tot = tot + o.astype(sab.dtype) * (2.0 ** (-q2 * (d + 2)))
        return (tot.reshape(CH, 2, NFAM, 3, n2)
                * xe.reshape(CH, 2, NFAM, 3, 1) * ec.oz_b_scale[0])

    tab0 = jax.jit(tab_leg)(sab0)

    K = 2 * npts
    q = min(_oz_q(K), 7)
    sa = -(-56 // q)
    sb = -(-53 // q)

    def prod_out(tab):
        prod = tab[:, 0][:, :, :, None, :] * \
            tab[:, 1][:, :, None, :, :] / K
        xsl, xe = _oz_split_rows(prod * ec.oz_row[None, :NFAM], q, sa)
        x8 = (jnp.moveaxis(xsl.astype(jnp.int8), 2, 0)
              .reshape(NFAM, sa, CH * 9, K))
        tot = jnp.zeros((NFAM, CH * 9, nk + 1), tab.dtype)
        for d, rhs in enumerate(ec.oz_g_diags):
            iis = [i for i in range(sa) if 0 <= d - i < sb]
            lhs = jnp.concatenate([x8[:, i] for i in iis], axis=-1)
            o = jax.lax.dot_general(
                lhs, rhs[:NFAM], (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32)
            tot = tot + o.astype(tab.dtype) * (2.0 ** (-q * (d + 2)))
        # tot is [NFAM, CH*9, nk+1] with axis 1 ordered (chunk, a, b):
        # decode (f, c, a, b) THEN move the chunk axis out (a bare
        # moveaxis-reshape scrambles (a, b) against f when NFAM != 9)
        J = jnp.moveaxis(tot.reshape(NFAM, CH, 3, 3, nk + 1), 0, 1)
        return J * xe * ec.oz_g_scale[None, :NFAM]

    Jw0 = jax.jit(prod_out)(tab0)

    def pz_leg(P_e):
        return jax.vmap(
            lambda p: fastpt._pz_windowed(cfg, ec, p, g, nk))(P_e)

    PZ0 = jax.jit(pz_leg)(P_ext0)

    k = jnp.asarray(g.k)

    def assemble(Jw, PZw, J_lo):
        return jax.vmap(lambda jw, pz, jl: assembly.assemble(
            jw[:7], pz, jw[7:], jl, k, True))(Jw, PZw, J_lo)

    stages = {
        "extend   ": wrap(lambda y: fastpt.extend_power(
            cfg, lnP_of(y).reshape(CH * 3, nk), n_s[0], ec
        ).reshape(CH, 3, npts)),
        "fwd+coef ": wrap(lambda y: fwd_coef(
            P_ext0 * (1 + 1e-15 * y[0, 0]))),
        "tab      ": wrap(lambda y: tab_leg(
            sab0 * (1 + 1e-15 * y[0, 0]))),
        "prod+out ": wrap(lambda y: prod_out(
            tab0 * (1 + 1e-15 * y[0, 0]))),
        "pz       ": wrap(lambda y: pz_leg(
            P_ext0 * (1 + 1e-15 * y[0, 0]))),
        "assemble ": wrap(lambda y: jnp.concatenate([
            x.reshape(CH, -1) for x in assemble(
                Jw0[..., :nk] * (1 + 1e-15 * y[0, 0]),
                PZ0, Jw0[:, 0, 0, 0, nk])], axis=1)),
        "trivial  ": wrap(lambda y: y[:, :1] * 2.0),
    }
    for name, step in stages.items():
        print(f"{name}: {inloop_time(step, y0)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
