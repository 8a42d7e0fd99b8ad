#!/usr/bin/env python
"""Per-leg timing decomposition of the full-TRG RHS at large grids.

VERDICT r3 item 1: the high-accuracy grid (nk=512) runs at ~22-29
cosmologies/min vs 3480/min at nk=128.  Before rebuilding anything,
measure WHERE the time goes at np=2048/4096: forward stage, tab leg,
spectra product, Ozaki out leg, PZ leg, assembly, and the Omega/I/Q
tail — plus the step-attempt count at the preset tolerances, so
attempts x per-eval cost reconciles against the end-to-end number.

Usage: probe_nk512_legs.py [--chunk N] [--preset high-accuracy|v01-compat|default]
                           [--attempts] [--tableau rkf45|dop853]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import _example_inputs  # noqa: E402
from redtime_tpu import design, driver, fastpt, fourier, trg  # noqa: E402
from redtime_tpu.config import (CosmoParams, RunSettings,  # noqa: E402
                                SolverConfig)
from redtime_tpu.fastpt import (NFAM, _cmul, _oz_dot, _oz_q, _oz_sa,  # noqa: E402
                                _oz_split_rows, engine_consts, extend_power)
from redtime_tpu.ode import DOP853, RKF45, integrate_interval  # noqa: E402

Z_OUT_PROD = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def _design_cosmo(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
                            Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
                            T_cmb=2.726, w0=w0, wa=wa)


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--preset", default="high-accuracy",
                    choices=("high-accuracy", "v01-compat", "default"))
    ap.add_argument("--attempts", action="store_true",
                    help="also run the (slow) stats solve for step counts")
    ap.add_argument("--tableau", default="rkf45",
                    choices=("rkf45", "dop853"))
    args = ap.parse_args()
    chunk = args.chunk

    mode = "matmul" if jax.default_backend() == "tpu" else "fft"
    mk = {"high-accuracy": SolverConfig.high_accuracy,
          "v01-compat": SolverConfig.v01_compat,
          "default": SolverConfig}[args.preset]
    cfg = mk(fft_mode=mode)
    print(f"backend {jax.default_backend()}, preset {args.preset}: "
          f"nk={cfg.nk} np={cfg.npts}, tol ({cfg.eabs_P}, {cfg.erel_P})")
    print(f"oz legs: {sorted(fastpt._oz_enabled(cfg))}, "
          f"bytes {fastpt._oz_leg_bytes(cfg)}")
    settings = RunSettings(one_loop=False, z_out=Z_OUT_PROD)
    lin = _example_inputs(cfg)
    rows = design.models_from_unit_cube(
        design.latin_hypercube(chunk, seed=42))
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_design_cosmo(r) for r in rows])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * chunk))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep = driver._jitted_prepare(cfg, True)
        ms = prep(jax.device_put(cosmos, cpu), jax.device_put(lins, cpu))
        jax.block_until_ready(ms)
    dev = jax.devices()[0]
    ms = jax.device_put(ms, dev)
    ec = jax.device_put(engine_consts(cfg, mode), dev)

    g = trg.make_grids(cfg)
    nk, npts, half = g.nk, g.npts, g.npts // 2
    k = jnp.asarray(g.k)

    y0 = jax.jit(jax.vmap(
        lambda m: trg.initial_state(cfg, settings, m)))(ms)

    # --- full RHS (ec passed as a jit ARGUMENT — baked-in GB-scale
    # constants multiply TPU remote-compile time, docs/TPU_NOTES.md)
    def one_rhs(model, y, ec):
        rhs = trg.make_rhs(cfg, settings, model, None, mode, ec)
        return rhs(jnp.asarray(0.1), y)

    dt_rhs, _ = timed(jax.jit(jax.vmap(one_rhs, in_axes=(0, 0, None))),
                      ms, y0, ec, reps=10)
    print(f"\none RHS eval        : {dt_rhs*1e3:8.1f} ms")

    # --- engine (J/PZ + assembly)
    def engine_only(model, y, ec):
        lnP = y.reshape(trg.NU_STATE, nk)[0:3]
        A_u, R, PT, PMR = trg.compute_mode_coupling_full(
            cfg, lnP, model.cosmo.n_s, True, k, mode, ec)
        return A_u.sum() + R.sum() + PT.sum() + PMR.sum()

    dt_eng, _ = timed(jax.jit(jax.vmap(engine_only, in_axes=(0, 0, None))),
                      ms, y0, ec, reps=10)
    print(f"engine (J/PZ + asm) : {dt_eng*1e3:8.1f} ms")

    # --- J/PZ windowed
    def jpz_only(model, y, ec):
        lnP = y.reshape(trg.NU_STATE, nk)[0:3]
        Pext = extend_power(cfg, lnP, model.cosmo.n_s, ec)
        Jw, J_lo, PZw = fastpt.compute_J_PZ_windowed(cfg, Pext, True,
                                                     mode, ec)
        return Jw.sum() + J_lo + PZw.sum()

    dt_jpz, _ = timed(jax.jit(jax.vmap(jpz_only, in_axes=(0, 0, None))),
                      ms, y0, ec, reps=10)
    print(f"J/PZ windowed       : {dt_jpz*1e3:8.1f} ms"
          f"   (assembly+tail by difference: "
          f"asm {max(dt_eng - dt_jpz, 0)*1e3:.1f}, "
          f"omega-tail {max(dt_rhs - dt_eng, 0)*1e3:.1f})")

    # --- stage intermediates (host-built once, device-resident)
    def mk_pext(model, y, ec):
        lnP = y.reshape(trg.NU_STATE, nk)[0:3]
        return extend_power(cfg, lnP, model.cosmo.n_s, ec)

    P_ext = jax.jit(jax.vmap(mk_pext, in_axes=(0, 0, None)))(ms, y0, ec)
    dt_ext, _ = timed(jax.jit(jax.vmap(
        lambda m, y, ec: mk_pext(m, y, ec).sum(),
        in_axes=(0, 0, None))), ms, y0, ec, reps=10)
    print(f"  extend_power      : {dt_ext*1e3:8.1f} ms")

    nfam = NFAM

    def mk_sab(P_ext, ec):
        P_e = P_ext.astype(ec.kbias.dtype)
        with jax.default_matmul_precision("highest"):
            if (ec.oz_f_diags is not None
                    and fastpt._fwd_leg_resolved(cfg) == "ozaki"):
                qf = min(_oz_q(npts), 7)
                ci = _oz_dot(P_e * ec.kbias, ec.oz_f_diags, ec.oz_f_scale,
                             ec.oz_f_row, qf, _oz_sa(qf), -(-53 // qf))
            else:
                ci = (P_e * ec.kbias) @ ec.dft_fwd_half
            ca_re, ca_im = ci[:, :half], ci[:, half:]

            def coeff(gr, gi):
                sr, si = _cmul(ca_re[None], ca_im[None],
                               gr[:nfam, None], gi[:nfam, None])
                return jnp.concatenate([sr, si], axis=-1)

            return jnp.stack([coeff(ec.ga_re, ec.ga_im),
                              coeff(ec.gb_re, ec.gb_im)])

    dt_fwd, sab = timed(jax.jit(jax.vmap(mk_sab, in_axes=(0, None))),
                        P_ext, ec, reps=10)
    print(f"  fwd leg (+coeff)  : {dt_fwd*1e3:8.1f} ms")

    def mk_tab(sab, ec):
        with jax.default_matmul_precision("highest"):
            q2 = min(_oz_q(npts), 7)
            sa2 = _oz_sa(q2)
            sb2 = -(-53 // q2)
            rows = 2 * nfam * 3
            n2 = 2 * npts
            xsl, xe = _oz_split_rows(sab, q2, sa2)
            x8 = xsl.astype(jnp.int8).reshape((sa2, rows, npts))
            tot = jnp.zeros((rows, n2), sab.dtype)
            for d, rhs_m in enumerate(ec.oz_b_diags):
                iis = [i for i in range(sa2) if 0 <= d - i < sb2]
                lhs = jnp.concatenate([x8[i] for i in iis], axis=-1)
                o = jax.lax.dot_general(
                    lhs, rhs_m, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.int32)
                tot = tot + o.astype(sab.dtype) * (2.0 ** (-q2 * (d + 2)))
            return (tot.reshape(2, nfam, 3, n2) * xe * ec.oz_b_scale[0])

    dt_tab, tab = timed(jax.jit(jax.vmap(mk_tab, in_axes=(0, None))),
                        sab, ec, reps=10)
    print(f"  tab leg (ozaki)   : {dt_tab*1e3:8.1f} ms")

    def mk_prod(tab):
        return tab[0][:, :, None, :] * tab[1][:, None, :, :] / (2 * npts)

    dt_prod, prod = timed(jax.jit(jax.vmap(mk_prod)), tab, reps=10)
    print(f"  spectra product   : {dt_prod*1e3:8.1f} ms")

    def mk_out(prod, ec):
        with jax.default_matmul_precision("highest"):
            K = 2 * npts
            O = nk + 1
            q = min(_oz_q(K), 7)
            sa = -(-56 // q)
            sb = -(-53 // q)
            xsl, xe = _oz_split_rows(prod * ec.oz_row[:nfam], q, sa)
            x8 = (jnp.moveaxis(xsl.astype(jnp.int8), 1, 0)
                  .reshape(nfam, sa, 9, K))
            tot = jnp.zeros((nfam, 9, O), prod.dtype)
            for d, rhs_m in enumerate(ec.oz_g_diags):
                iis = [i for i in range(sa) if 0 <= d - i < sb]
                lhs = jnp.concatenate([x8[:, i] for i in iis], axis=-1)
                o = jax.lax.dot_general(
                    lhs, rhs_m[:nfam], (((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.int32)
                tot = tot + o.astype(prod.dtype) * (2.0 ** (-q * (d + 2)))
            J = tot.reshape(nfam, 3, 3, O)
            return J * xe * ec.oz_g_scale[:nfam]

    dt_out, _ = timed(jax.jit(jax.vmap(mk_out, in_axes=(0, None))),
                      prod, ec, reps=10)
    print(f"  out leg (ozaki)   : {dt_out*1e3:8.1f} ms"
          f"   [{len(ec.oz_g_diags)} diagonals]")

    def mk_pz(P_ext, ec):
        P_e = P_ext.astype(ec.kbias.dtype)
        with jax.default_matmul_precision("highest"):
            return fastpt._pz_windowed(cfg, ec, P_e, g, nk).sum()

    dt_pz, _ = timed(jax.jit(jax.vmap(mk_pz, in_axes=(0, None))),
                     P_ext, ec, reps=10)
    print(f"  pz leg            : {dt_pz*1e3:8.1f} ms")

    unacc = dt_jpz - (dt_ext + dt_fwd + dt_tab + dt_prod + dt_out + dt_pz)
    print(f"  (unaccounted      : {unacc*1e3:8.1f} ms — fusion overlap)")

    # --- step attempts at the preset tolerances
    if args.attempts:
        etasteps = np.asarray(settings.etasteps())
        t0s = np.concatenate([[0.0], etasteps[:-1]])
        segs = jnp.stack([jnp.asarray(t0s), jnp.asarray(etasteps)], axis=1)
        tabl = {"rkf45": RKF45, "dop853": DOP853}[args.tableau]

        def solve_stats(model, ec):
            rhs = trg.make_rhs(cfg, settings, model, None, mode, ec)
            y = trg.initial_state(cfg, settings, model)
            h = 1e-2 * float(np.log(1.0 / settings.a_in))

            def seg_f(carry, t0t1):
                y, h = carry
                y2, h2, n = integrate_interval(
                    rhs, t0t1[0], t0t1[1], y, h,
                    cfg.eabs_P, cfg.erel_P, tabl, return_stats=True)
                return (y2, h2), n

            (_, _), ns = jax.lax.scan(seg_f, (y, jnp.asarray(h)), segs)
            return ns

        dt_solve, ns = timed(jax.jit(jax.vmap(solve_stats,
                                              in_axes=(0, None))),
                             ms, ec, reps=1)
        ns = np.asarray(ns)
        nstage = len(tabl.c) if hasattr(tabl, "c") else 6
        print(f"\nsolve+stats ({args.tableau}): {dt_solve:.2f}s -> "
              f"{chunk/dt_solve*60:.1f}/min; attempts/seg (lockstep max): "
              f"{ns.max(axis=0)} total {int(ns.max(axis=0).sum())}")
        print(f"reconcile: attempts x stages x rhs = "
              f"{ns.max(axis=0).sum() * nstage * dt_rhs:.2f}s "
              f"vs measured {dt_solve:.2f}s")


if __name__ == "__main__":
    main()
