#!/usr/bin/env python
"""Real packed loop with surgical variants: base / nocond (reload runs
unconditionally) / onehot_t1 (gather-free segment-target lookup)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from __graft_entry__ import _cosmo, _example_inputs
from redtime_tpu import driver
from redtime_tpu.trg import (NU_STATE, initial_state, make_grids, make_rhs)
from redtime_tpu.config import RunSettings, SolverConfig
from redtime_tpu.fastpt import engine_consts
from redtime_tpu.ode import RKF45, rk_step

VARIANT = "base"
m0_closure = []
N = 8
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)

def evolve_packed(cfg: SolverConfig, settings: RunSettings, models,
                  n_lanes: int = 8, mode: str = "auto", ec=None,
                  max_iters: int = 1_000_000, return_iters: bool = False):
    """Work-queue batched evolution (the TPU batch scheduler).

    A plain vmapped adaptive solve steps all lanes in segment lockstep and
    pays max-over-lanes step attempts per segment — measured ~4x the
    per-model mean on production batches (the reference's shell loop,
    scripts/runRedTimeBatch:91-99, has no such waste because it is
    serial).  Here each of `n_lanes` lanes advances its OWN controller
    trajectory; when a lane passes its last output segment it flushes its
    outputs and pulls the next cosmology off the queue inside a
    scalar-predicated lax.cond, so model-table gathers are paid ~N times
    total, not per iteration.  Per-model trajectories apply the same
    controller arithmetic in the same order as trg.evolve (reference
    integrator redTime.cc:1589-1630); results agree with the chunked
    scheduler within the controller's own tolerance band (~1e-6 on the
    output table — XLA reduction order differs between batch lowerings,
    and the adaptive controller amplifies ulp-level RHS differences into
    slightly different step sequences, exactly as rebatching does).

    models: stacked prepared-Model pytree [N, ...].
    Returns ys [N, S, NU_STATE, nk] (S = number of output redshifts).
    """
    if settings.nonlinear and settings.one_loop:
        raise NotImplementedError(
            "packed scheduler supports full-TRG / linear modes; the "
            "1-loop fast path stays on the chunked scheduler")
    g = make_grids(cfg)
    nk = g.nk
    jdt = cfg.jdtype
    N = int(jax.tree_util.tree_leaves(models)[0].shape[0])
    L = min(n_lanes, N)
    S = len(settings.z_out)
    etasteps = jnp.asarray(settings.etasteps())
    eta_fin = float(np.log(1.0 / settings.a_in))
    h_init = jnp.float64(1e-2 * eta_fin)
    tab = RKF45
    nflat = NU_STATE * nk

    def lane_attempt(m, t, h, y, t1):
        """One controller attempt — the body of ode.integrate_interval
        verbatim, with the lane's own segment target t1."""
        rhs = make_rhs(cfg, settings, m, None, mode, ec)
        dt = t1 - t
        final = h > dt
        h_try = jnp.where(final, dt, h)
        y_new, yerr = rk_step(rhs, t, h_try, y, tab)
        d0 = cfg.eabs_P + cfg.erel_P * jnp.abs(y_new)
        r = jnp.max(jnp.abs(yerr) / d0)
        dec = r > 1.1
        ord_ = tab.order
        fac_dec = jnp.maximum(0.9 * r ** (-1.0 / ord_), 0.2)
        fac_inc = jnp.clip(0.9 * r ** (-1.0 / (ord_ + 1.0)), 1.0, 5.0)
        fac = jnp.where(dec, fac_dec, jnp.where(r < 0.5, fac_inc, 1.0))
        h_next = h_try * fac
        t_out = jnp.where(dec, t, jnp.where(final, t1, t + h_try))
        y_out = jnp.where(dec, y, y_new)
        return t_out, y_out, h_next, final & ~dec

    # all initial states once, OUTSIDE the loop (a trivially parallel
    # vmap); reloads then only gather rows instead of re-running the
    # P_lin/growth interpolation chain per reload event
    y0_all = jax.vmap(
        lambda mm: initial_state(cfg, settings, mm))(models)
    y0_all = y0_all.reshape(N, nflat)

    def load_states_onehot(idx, take):
        """Select models/initial states for lanes via one-hot einsum
        contractions — XLA's f64 gather lowers pathologically on the
        current TPU runtime (docs/TPU_NOTES.md), a matmul-style masked
        contraction is element-traffic bound instead.  Lanes with
        take=False receive zeros (discarded by the caller's select)."""
        oh = ((idx[:, None] == jnp.arange(N)[None, :])
              & take[:, None]).astype(jnp.float64)

        def pick(x):
            if jnp.issubdtype(x.dtype, jnp.inexact):
                flat = x.reshape(N, -1).astype(jnp.float64)
                return (oh @ flat).astype(x.dtype).reshape((L,)
                                                           + x.shape[1:])
            return jnp.take(x, jnp.where(take, idx, 0), axis=0)

        gm = jax.tree_util.tree_map(pick, models)
        return gm, (oh @ y0_all).astype(y0_all.dtype)

    def lane_select(take):
        def sel(a, b):
            return jnp.where(take.reshape((take.shape[0],)
                                          + (1,) * (a.ndim - 1)), a, b)
        return sel

    def reload(args):
        m, t, h, y, seg, midx, outloc, active, counter, outg = args
        finished = (seg >= S) & active
        # flush finished lanes into the global output (one-hot contraction
        # instead of an f64 scatter — pathological on this runtime)
        ohn = ((midx[None, :] == jnp.arange(N)[:, None])
               & finished[None, :])
        contrib = jnp.einsum("nl,lso->nso", ohn.astype(outg.dtype),
                             outloc)
        outg = jnp.where(ohn.any(axis=1)[:, None, None], contrib, outg)
        # pull next models off the queue (distinct index per lane)
        order = jnp.cumsum(finished.astype(jnp.int32)) - 1
        nmidx = counter + order
        has = nmidx < N
        take = finished & has
        gm, y0 = load_states_onehot(jnp.where(take, nmidx, 0), take)
        sel = lane_select(take)
        m = jax.tree_util.tree_map(sel, gm, m)
        y = jnp.where(take[:, None], y0.astype(y.dtype), y)
        t = jnp.where(take, 0.0, t)
        h = jnp.where(take, h_init, h)
        seg = jnp.where(take, 0, seg)
        midx = jnp.where(take, nmidx, midx)
        active = active & ~(finished & ~has)
        counter = counter + finished.sum(dtype=jnp.int32)
        return m, t, h, y, seg, midx, outloc, active, counter, outg

    def body(carry):
        (m, t, h, y, seg, midx, outloc, active, counter, outg, it) = carry
        if VARIANT == 'closuremodel':
            m = m0_closure[0]
        if VARIANT == 'onehot_t1':
            segc = jnp.minimum(seg, S - 1)
            t1 = (jnp.where(jnp.arange(S)[None, :] == segc[:, None],
                            etasteps[None, :], 0.0)).sum(-1)
        else:
            t1 = etasteps[jnp.minimum(seg, S - 1)]
        tn, yn, hn, reached = jax.vmap(lane_attempt)(m, t, h, y, t1)
        t = jnp.where(active, tn, t)
        h = jnp.where(active, hn, h)
        y = jnp.where(active[:, None], yn, y)
        reached = reached & active
        # record the segment output lane-locally (masked select, no
        # scatter); flushed to the global buffer on model completion
        if VARIANT != 'nooutloc':
            oh = ((jnp.arange(S)[None, :] == seg[:, None])
                  & reached[:, None])
            outloc = jnp.where(oh[..., None], y[:, None, :], outloc)
        seg = seg + reached.astype(seg.dtype)
        st = (m, t, h, y, seg, midx, outloc, active, counter, outg)
        if VARIANT == 'noreload':
            pass
        elif VARIANT == 'nocond':
            st = reload(st)
        else:
            st = jax.lax.cond(jnp.any((seg >= S) & active), reload,
                              lambda a: a, st)
        return st + (it + 1,)

    def cond(carry):
        active, it = carry[7], carry[10]
        return jnp.any(active) & (it < max_iters)

    m0 = jax.tree_util.tree_map(lambda x: x[:L], models)
    m0_closure.clear(); m0_closure.append(m0)
    y0 = y0_all[:L]
    carry0 = (m0,
              jnp.zeros(L, jnp.float64),
              jnp.full(L, h_init),
              y0.astype(jdt),
              jnp.zeros(L, jnp.int32),
              jnp.arange(L, dtype=jnp.int32),
              jnp.zeros((L, S, nflat), jdt),
              jnp.ones(L, bool),
              jnp.asarray(L, jnp.int32),
              jnp.zeros((N, S, nflat), jdt),
              jnp.asarray(0, jnp.int32))
    fin = jax.lax.while_loop(cond, body, carry0)
    out = fin[9].reshape(N, S, NU_STATE, nk)
    if return_iters:
        return out, fin[10]
    return out




def main():
    global VARIANT
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
    for variant in ("closuremodel",):
        VARIANT = variant
        cap = 1_000_000
        f = jax.jit(lambda m, e, c=cap: evolve_packed(
            cfg, settings, m, 8, mode, e, max_iters=c,
            return_iters=True))
        out, it = f(ms, ec)
        jax.block_until_ready(out)
        t0 = time.time()
        out, it = f(ms, ec)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"  {variant:10s}: {dt:6.3f}s  iters={int(it)}  "
              f"{dt/int(it)*1e3:5.2f} ms/iter")


if __name__ == "__main__":
    main()
