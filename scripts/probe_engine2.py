#!/usr/bin/env python
"""In-loop stage decomposition of the WINDOWED engine path (post-fusion).

Cumulative stages: fwd (forward dot + gamma coeffs), tab (+ backward
legs dot), prod (+ pair products), out (+ fused output contraction),
full (+ PZ + assemble)."""

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
from redtime_tpu import driver, fastpt, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import _cmul, engine_consts  # noqa: E402

CH = 8
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
    cfg = SolverConfig(fft_mode=mode, conv_radix=int(os.environ.get("REDTIME_RADIX", "4")))
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
    nk = cfg.nk
    g = trg.make_grids(cfg)
    npts, half = g.npts, g.npts // 2
    nfam = fastpt.NFAM
    k = jnp.asarray(g.k)
    ns_v = ms.cosmo.n_s

    def wrap(stage_fn):
        def step(y):
            def one(n_s, yy):
                lnP = yy.reshape(trg.NU_STATE, nk)[0:3]
                r = stage_fn(lnP, n_s)
                out = jnp.zeros((trg.NU_STATE, nk))
                out = out.at[3].set(r[:nk])
                return out.reshape(-1)
            dy = jax.vmap(one)(ns_v, y)
            return y * 0.999 + y0 * 0.001 + 1e-12 * dy
        return step

    def _fwd(lnP, n_s):
        P_e = fastpt.extend_power(cfg, lnP, n_s, ec)
        with jax.default_matmul_precision("highest"):
            ci = (P_e * ec.kbias) @ ec.dft_fwd_half
            ca_re, ca_im = ci[:, :half], ci[:, half:]

            def coeff(gr, gi):
                sr, si = _cmul(ca_re[None], ca_im[None],
                               gr[:nfam, None], gi[:nfam, None])
                return jnp.concatenate([sr, si], axis=-1)

            sab = jnp.stack([coeff(ec.ga_re, ec.ga_im),
                             coeff(ec.gb_re, ec.gb_im)])
        return P_e, sab

    def st_fwd(lnP, n_s):
        _, sab = _fwd(lnP, n_s)
        return sab.sum(axis=(0, 1, 2))

    def _tab(lnP, n_s):
        P_e, sab = _fwd(lnP, n_s)
        with jax.default_matmul_precision("highest"):
            tab = sab @ ec.dft_bwd_half
        return P_e, tab

    def st_tab(lnP, n_s):
        _, tab = _tab(lnP, n_s)
        return tab.sum(axis=(0, 1, 2))

    def _prod(lnP, n_s):
        P_e, tab = _tab(lnP, n_s)
        prod = tab[0][:, :, None, :] * tab[1][:, None, :, :] / (2 * npts)
        return P_e, prod

    def st_prod(lnP, n_s):
        _, prod = _prod(lnP, n_s)
        return prod.sum(axis=(0, 1, 2))

    def st_out(lnP, n_s):
        _, prod = _prod(lnP, n_s)
        n2h = npts + 1
        with jax.default_matmul_precision("highest"):
            c = prod @ ec.dft_conv_fwd
            cf_re, cf_im = _cmul(c[..., :n2h], c[..., n2h:],
                                 ec.fh_re[:nfam, None, None],
                                 ec.fh_im[:nfam, None, None])
            t = jnp.concatenate([cf_re, cf_im], axis=-1) @ ec.dft_bwd_out
            Jw = t * ec.prek_out[:nfam, None, None, :]
        return Jw.sum(axis=(0, 1, 2))[:nk]

    def st_full(lnP, n_s):
        A_u, R, PT, PMR = trg.compute_mode_coupling_full(
            cfg, lnP, n_s, True, k, mode, ec)
        return A_u.sum(axis=0) + R.sum(axis=(0, 1))

    for name, fn in [("fwd", st_fwd), ("tab", st_tab), ("prod", st_prod),
                     ("out", st_out), ("full", st_full)]:
        dt = inloop_time(wrap(fn), y0)
        print(f"{name:5s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
