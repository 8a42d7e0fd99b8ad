#!/usr/bin/env python
"""In-loop stage decomposition of the FAST-PT engine on the accelerator.

Cumulative stages (each includes the previous):
  ext     : extend_power only
  fwd     : + forward DFT + coefficient products
  conv    : + backward/product/forward convolution legs
  out     : + f-multiply + output DFT (full compute_J_PZ minus PZ)
  jpz     : full compute_J_PZ (adds Toeplitz PZ)
  full    : + windowing + assemble (= compute_mode_coupling_full)
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
from redtime_tpu import assembly, driver, fastpt, fourier, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

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
    cfg = SolverConfig(fft_mode=mode)
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

    def st_ext(lnP, n_s):
        P_ext = fastpt.extend_power(cfg, lnP, n_s, ec)
        return P_ext.reshape(-1)

    def _fwd(lnP, n_s):
        P_ext = fastpt.extend_power(cfg, lnP, n_s, ec)
        with jax.default_matmul_precision("highest"):
            re, im = fourier.rfft(P_ext * ec.kbias, mode, ec.dft_np)
            re, im = re * ec.wc, im * ec.wc
            ca_re, ca_im = re[:, :half], im[:, :half]
            sa_re, sa_im = fastpt._cmul(
                ca_re[None], ca_im[None],
                ec.ga_re[:nfam, None], ec.ga_im[:nfam, None])
            sb_re, sb_im = fastpt._cmul(
                ca_re[None], ca_im[None],
                ec.gb_re[:nfam, None], ec.gb_im[:nfam, None])
        return P_ext, sa_re, sa_im, sb_re, sb_im

    def st_fwd(lnP, n_s):
        _, sa_re, sa_im, sb_re, sb_im = _fwd(lnP, n_s)
        return (sa_re.sum(axis=(0, 1)) + sb_im.sum(axis=(0, 1)))

    def _conv(lnP, n_s):
        P_ext, sa_re, sa_im, sb_re, sb_im = _fwd(lnP, n_s)
        n2 = 2 * npts
        with jax.default_matmul_precision("highest"):
            pad = jnp.zeros(sa_re.shape[:-1] + (npts + 1 - half,),
                            sa_re.dtype)
            padc = lambda x: jnp.concatenate([x, pad], -1)
            ta = fourier.hc_backward(padc(sa_re), padc(sa_im), n2, mode,
                                     ec.dft_2np)
            tb = fourier.hc_backward(padc(sb_re), padc(sb_im), n2, mode,
                                     ec.dft_2np)
            prod = ta[:, :, None, :] * tb[:, None, :, :] / n2
            c_re, c_im = fourier.rfft(prod, mode, ec.dft_2np)
        return P_ext, c_re, c_im

    def st_conv(lnP, n_s):
        _, c_re, c_im = _conv(lnP, n_s)
        return c_re.sum(axis=(0, 1, 2)) + c_im.sum(axis=(0, 1, 2))

    def st_out(lnP, n_s):
        P_ext, c_re, c_im = _conv(lnP, n_s)
        with jax.default_matmul_precision("highest"):
            cf_re, cf_im = fastpt._cmul(c_re, c_im,
                                        ec.fh_re[:nfam, None, None],
                                        ec.fh_im[:nfam, None, None])
            t = cf_re @ ec.dft_out[0] + cf_im @ ec.dft_out[1]
            J = t * ec.prek[:nfam, None, None, :]
        return J.sum(axis=(0, 1, 2))

    def st_jpz(lnP, n_s):
        P_ext = fastpt.extend_power(cfg, lnP, n_s, ec)
        J, PZ = fastpt.compute_J_PZ(cfg, P_ext, True, mode, ec)
        return J.sum(axis=(0, 1, 2)) + PZ.sum(axis=(0, 1, 2))

    def st_full(lnP, n_s):
        A_u, R, PT, PMR = trg.compute_mode_coupling_full(
            cfg, lnP, n_s, True, k, mode, ec)
        return A_u.sum(axis=0) + R.sum(axis=(0, 1))

    for name, fn in [("ext", st_ext), ("fwd", st_fwd), ("conv", st_conv),
                     ("out", st_out), ("jpz", st_jpz), ("full", st_full)]:
        dt = inloop_time(wrap(fn), y0)
        print(f"{name:5s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
