#!/usr/bin/env python
"""Steady-state (in-while-loop) per-iteration cost of RHS components.

Each candidate op runs N times inside one jitted fori_loop with a data
dependence on the carry, so dispatch/RTT overhead is excluded and XLA
cannot hoist the op. This is the number that matters inside the solver's
while_loop."""

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
from redtime_tpu import assembly, driver, trg  # noqa: E402
from redtime_tpu.config import RunSettings, SolverConfig  # noqa: E402
from redtime_tpu.fastpt import engine_consts  # noqa: E402

CH = 8
N_ITER = 50
Z_OUT = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def inloop_time(step, y0, n=N_ITER, reps=3):
    """step: carry -> carry (same pytree). Returns per-iteration seconds."""
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

    def renorm(y):
        # keep lnP rows sane across iterations, perturb deterministically
        return y * 0.999 + y0 * 0.001

    # --- full RHS
    def full_rhs_step(y):
        def one(m, yy):
            rhs = trg.make_rhs(cfg, settings, m, None, mode, ec)
            return rhs(jnp.asarray(0.1), yy)
        dy = jax.vmap(one)(ms, y)
        return renorm(y + 1e-9 * dy)

    print(f"full RHS        : {inloop_time(full_rhs_step, y0)*1e3:7.2f} ms")

    # --- engine only
    def engine_step(y):
        def one(m, yy):
            lnP = yy.reshape(trg.NU_STATE, nk)[0:3]
            A_u, R, PT, PMR = trg.compute_mode_coupling_full(
                cfg, lnP, m.cosmo.n_s, True,
                jnp.asarray(trg.make_grids(cfg).k), mode, ec)
            out = jnp.zeros((trg.NU_STATE, nk))
            out = out.at[3:17].set(A_u)
            return out.reshape(-1)
        dy = jax.vmap(one)(ms, y)
        return renorm(y + 1e-9 * dy)

    print(f"engine only     : {inloop_time(engine_step, y0)*1e3:7.2f} ms")

    # --- omega alone
    def omega_step(y):
        def one(m, yy):
            O = trg.omega_matrix(cfg, m, 0.3 + 1e-9 * yy[0])
            out = jnp.zeros((trg.NU_STATE, nk))
            out = out.at[0:2, :].set(O[0] + O[1])
            return out.reshape(-1)
        dy = jax.vmap(one)(ms, y)
        return renorm(y + 1e-9 * dy)

    print(f"omega_matrix    : {inloop_time(omega_step, y0)*1e3:7.2f} ms")

    # --- einsum tail alone (real shapes, real code path)
    O_const = jax.vmap(lambda m: trg.omega_matrix(cfg, m, 0.3))(ms)

    def tail_step(y):
        def one(O, yy):
            yv = yy.reshape(trg.NU_STATE, nk)
            Ifull = assembly.expand64(yv[3:17]).reshape(
                2, 2, 2, 2, 2, 2, nk)
            t1 = jnp.einsum("bgk,acdgefk->acdbefk", O, Ifull)
            t2 = jnp.einsum("egk,acdbgfk->acdbefk", O, Ifull)
            t3 = jnp.einsum("fgk,acdbegk->acdbefk", O, Ifull)
            dI = (t1 + t2 + t3).reshape(64, nk)[jnp.asarray(assembly.JU)]
            Q = yv[17:].reshape(3, 2, 2, 2, nk)
            q1 = jnp.einsum("adk,ldbck->labck", O, Q)
            q2 = jnp.einsum("bdk,ladck->labck", O, Q)
            q3 = jnp.einsum("cdk,labdk->labck", O, Q)
            Isum = jnp.einsum("pcdqcdk->pqk", Ifull)
            out = jnp.zeros((trg.NU_STATE, nk))
            out = out.at[3:17].set(dI)
            out = out.at[17:].set((q1 + q2 + q3).reshape(24, nk))
            out = out.at[0:2].set(Isum.reshape(4, nk)[:2])
            return out.reshape(-1)
        dy = jax.vmap(one)(O_const, y)
        return renorm(y + 1e-9 * dy)

    print(f"einsum tail     : {inloop_time(tail_step, y0)*1e3:7.2f} ms")

    # --- one-hot matmul tail (candidate rewrite)
    JU = assembly.JU
    S64 = assembly.SCATTER64                      # [64, 14]
    # sigma_c(r, g): row index after replacing position c's index with g
    def comp(r):  # r -> (a, c, d, b, e, f)
        return ((r >> 5) & 1, (r >> 4) & 1, (r >> 3) & 1,
                (r >> 2) & 1, (r >> 1) & 1, r & 1)

    def slot(a, c, d, b, e, f):
        return 32 * a + 16 * c + 8 * d + 4 * b + 2 * e + f

    # contractions over b (pos 3), e (pos 4), f (pos 5); O-left index is
    # the contracted position's ORIGINAL index
    P_mats, Qo_mats = [], []
    for pos in (3, 4, 5):
        for g in (0, 1):
            P = np.zeros((64, 64))
            Qo = np.zeros((64, 4))
            for r in range(64):
                idx = list(comp(r))
                i_orig = idx[pos]
                idx[pos] = g
                P[r, slot(*idx)] = 1.0
                Qo[r, 2 * i_orig + g] = 1.0
            P_mats.append(P @ S64)               # [64, 14] direct from I14
            Qo_mats.append(Qo)
    JUSEL = np.zeros((14, 64))
    for j, s in enumerate(JU):
        JUSEL[j, s] = 1.0
    # fold JUSEL into P/Qo: t_c restricted to unique rows only
    P14 = [jnp.asarray(JUSEL @ P) for P in P_mats]    # [14, 14]
    Q14 = [jnp.asarray(JUSEL @ Q) for Q in Qo_mats]   # [14, 4]
    # trace map for Isum: [4, 64] -> through S64 [4, 14]
    TR = np.zeros((4, 64))
    for p in range(2):
        for q in range(2):
            for c in range(2):
                for d in range(2):
                    TR[2 * p + q, slot(p, c, d, q, c, d)] += 1.0
    TR14 = jnp.asarray(TR @ S64)                      # [4, 14]

    # Q-state contractions: rows r = 4a + 2b + c per ell
    PQ_mats, QoQ_mats = [], []
    for pos in range(3):
        for g in (0, 1):
            P = np.zeros((8, 8))
            Qo = np.zeros((8, 4))
            for r in range(8):
                idx = [(r >> 2) & 1, (r >> 1) & 1, r & 1]
                i_orig = idx[pos]
                idx[pos] = g
                P[r, 4 * idx[0] + 2 * idx[1] + idx[2]] = 1.0
                Qo[r, 2 * i_orig + g] = 1.0
            PQ_mats.append(jnp.asarray(P))
            QoQ_mats.append(jnp.asarray(Qo))

    def tail_onehot_step(y):
        def one(O, yy):
            yv = yy.reshape(trg.NU_STATE, nk)
            I14 = yv[3:17]
            Of = O.reshape(4, nk)
            t = jnp.zeros((14, nk))
            for c in range(3):
                for g in range(2):
                    i = 2 * c + g
                    t = t + (Q14[i] @ Of) * (P14[i] @ I14)
            Isum = TR14 @ I14                      # [4, nk]
            Q = yv[17:].reshape(3, 8, nk)
            qt = jnp.zeros((3, 8, nk))
            for c in range(3):
                for g in range(2):
                    i = 2 * c + g
                    ofac = QoQ_mats[i] @ Of        # [8, nk]
                    qt = qt + ofac[None] * jnp.einsum(
                        "rs,lsk->lrk", PQ_mats[i], Q)
            out = jnp.zeros((trg.NU_STATE, nk))
            out = out.at[3:17].set(t)
            out = out.at[17:].set(qt.reshape(24, nk))
            out = out.at[0:2].set(Isum[:2])
            return out.reshape(-1)
        dy = jax.vmap(one)(O_const, y)
        return renorm(y + 1e-9 * dy)

    print(f"one-hot tail    : "
          f"{inloop_time(tail_onehot_step, y0)*1e3:7.2f} ms")

    # numerical equivalence of the two tails
    a = tail_step(y0)
    b = tail_onehot_step(y0)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(f"tail rewrite max rel diff: {err:.2e}")

    # --- trivial op floor
    def triv(y):
        return renorm(y * 1.0000001)
    print(f"trivial op floor: {inloop_time(triv, y0)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
