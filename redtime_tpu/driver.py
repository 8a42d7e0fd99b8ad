"""End-to-end solver driver: prepare -> evolve -> output tables.

Single-cosmology path plus a vmap/pjit batch path (the TPU-native
replacement for the reference's `runRedTimeBatch` serial shell loop,
scripts/runRedTimeBatch:91-99).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from redtime_tpu import interp
from redtime_tpu import model as mdl
from redtime_tpu import trg
from redtime_tpu.config import H0H, CosmoParams, RunSettings, SolverConfig
from redtime_tpu import background as bg
from redtime_tpu.grids import make_grids
from redtime_tpu.io.camb import LinearData
from redtime_tpu.io.params import ParamsFile

prepare_model = mdl.prepare_model

import functools


@functools.lru_cache(maxsize=16)
def _device_ec(cfg: SolverConfig, mode: str, where):
    """Engine-constant pack committed to a device (or sharding), cached:
    the pack is ~85 MB of f64 DFT/Toeplitz matrices and re-transferring it
    per sub-batch chunk dominates chunked-batch overhead."""
    from redtime_tpu.fastpt import engine_consts
    return jax.device_put(engine_consts(cfg, mode), where)


def _jitted_prepare(cfg: SolverConfig, batched: bool,
                    with_norm: bool = False):
    # normalize the default at the call boundary: lru_cache keys 2-arg
    # and 3-arg calls separately, double-compiling the same program
    return _jitted_prepare_impl(cfg, batched, with_norm)


@functools.lru_cache(maxsize=64)
def _jitted_prepare_impl(cfg: SolverConfig, batched: bool,
                         with_norm: bool):
    if with_norm:
        fn = lambda c, l, n: mdl.prepare_model(cfg, c, l, norm_override=n)
    else:
        fn = lambda c, l: mdl.prepare_model(cfg, c, l)
    return jax.jit(jax.vmap(fn) if batched else fn)


@functools.lru_cache(maxsize=64)
def _jitted_solve(cfg: SolverConfig, settings: RunSettings, mode: str,
                  batched: bool, mesh=None, axis: str = "batch"):
    fn = lambda m, e: solve(cfg, settings, m, mode, e)
    if batched:
        fn = jax.vmap(fn, in_axes=(0, None))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.jit(fn, out_shardings=NamedSharding(mesh, P(axis)))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_pipeline(cfg: SolverConfig, settings: RunSettings, mode: str,
                     batched: bool, mesh=None, axis: str = "batch",
                     with_norm: bool = False):
    """prepare_model + solve fused in one jitted program (the CPU /
    single-backend path); cached so repeated calls don't retrace."""
    def go(c, lin, ec, norm=None):
        m = mdl.prepare_model(cfg, c, lin, norm_override=norm)
        return solve(cfg, settings, m, mode, ec)

    if not with_norm:
        base = go
        go = lambda c, lin, ec: base(c, lin, ec)
    if batched:
        in_axes = (0, 0, None, 0) if with_norm else (0, 0, None)
        go = jax.vmap(go, in_axes=in_axes)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.jit(go, out_shardings=NamedSharding(mesh, P(axis)))
    return jax.jit(go)


class RunResult(NamedTuple):
    """Arrays of one solver run (a pytree; batch results stack it)."""

    k: jnp.ndarray          # [nk]
    table: jnp.ndarray      # [n_eta, nk, ncol] — printed column layout
    eta: jnp.ndarray        # [n_eta] header scalars
    a: jnp.ndarray
    z: jnp.ndarray
    H: jnp.ndarray          # H in h/Mpc units (reference prints H_H0*H0h)
    sigma_v2: jnp.ndarray   # [n_eta]
    sigmaV2_z0: jnp.ndarray
    eta_fin: jnp.ndarray



def _target_device():
    """The device computation actually lands on: honors jax_default_device
    (tests pin CPU while an accelerator plugin owns the default backend)."""
    dev = jax.config.jax_default_device
    if dev is None:
        dev = jax.devices()[0]
    return dev


def n_columns(cfg: SolverConfig, settings: RunSettings) -> int:
    n = 1
    if settings.print_lin:
        n += 6
    n += 3
    if cfg.print_a:
        n += 14
    if cfg.print_i:
        n += 14
    if settings.print_rsd and cfg.print_bias:
        n += 22
    if settings.print_rsd and not cfg.print_bias:
        n += 7
    if cfg.print_q:
        n += 24
    return n


def build_output_block(cfg: SolverConfig, settings: RunSettings,
                       model: mdl.Model, y, z,
                       mode: str = "auto", ec=None) -> jnp.ndarray:
    """One output block [nk, ncol] (reference main output loop,
    redTime.cc:1646-1741).  z may be traced (the blocks are vmapped)."""
    g = make_grids(cfg)
    k = jnp.asarray(g.k)
    # outputs are always assembled in f64; in float32 (throughput) mode only
    # the time stepping runs in f32, so promote the evolved state here
    y = y.astype(jnp.float64)
    a = 1.0 / (1.0 + z)
    r = a / settings.a_in
    r2, r3, r4 = r * r, r ** 3, r ** 4
    cols = [k]

    if settings.print_lin:
        D, dDda = mdl.growth_D_f(model, z)
        f = a * dDda / D
        _, Pcb, Pnu = mdl.plin_all(cfg, model, z)
        beta = mdl.beta_P_solver(model, a)
        b1 = mdl.beta_P_solver(model, 1.0)
        aL, aR = a * 0.999, jnp.minimum(1.0, a * 1.001)
        dlnB_num = (mdl.beta_P_solver(model, aR)
                    - mdl.beta_P_solver(model, aL)) / (aR - aL)
        dlnB = jnp.where(model.f_nu < 1e-10, 0.0, (a / beta) * dlnB_num)
        cols += [D, f, Pcb, beta / (b1 + 1e-100), dlnB, Pnu]

    P = jnp.exp(y[0:3])
    cols += [P[0] * r2, P[1] * r2, P[2] * r2]

    # 1-loop mode recomputes the full mode coupling at the output time from
    # the evolved spectra (reference :1646-1653); full-TRG mode leaves the
    # PT stack at zero (documented output caveat, SURVEY section 2) unless
    # cfg.fill_pt_full_trg opts into computing it from the evolved spectra
    need_mc = settings.nonlinear and (
        settings.one_loop or cfg.fill_pt_full_trg) and (
        settings.print_rsd or cfg.print_a or cfg.print_bias)
    if need_mc:
        A_u, _, PTjm, PMR = trg.compute_mode_coupling_full(
            cfg, y[0:3], model.cosmo.n_s, settings.print_rsd, k, mode, ec)
        PT = trg._collapse_pt(PTjm)
    else:
        A_u = jnp.zeros((14, g.nk))
        PTjm = jnp.zeros((9, g.nk))
        PMR = jnp.zeros((8, g.nk))
        PT = jnp.zeros((4, g.nk))

    if cfg.print_a:
        cols += list(A_u)
    if cfg.print_i:
        cols += list(y[trg.NUP:trg.NUP + trg.NUI])

    if settings.print_rsd:
        pb = trg.pbis_j(cfg, y) * r3          # [5, nk]
        if cfg.print_bias:
            cols += list(pb)
            cols += [PTjm[n] * r4 for n in range(9)]
            cols += [PMR[n] * r4 for n in range(8)]
        else:
            cols += [pb[0] + pb[1], pb[2] + pb[3], pb[4]]
            cols += [PT[n] * r4 for n in range(4)]

    if cfg.print_q:
        cols += [y[trg.NUP + trg.NUI + j] * r3 for j in range(trg.NUQ)]

    return jnp.stack(cols, axis=1)


def _check_settings(settings: RunSettings,
                    cfg: SolverConfig | None = None) -> None:
    import numpy as _np
    z = _np.asarray(settings.z_out, dtype=float)
    if z.size == 0:
        raise ValueError("z_out is empty")
    if _np.any(_np.diff(z) > 0):
        raise ValueError(
            f"z_out must be ordered from greatest to least (reference "
            f"params convention); got {list(settings.z_out)}")
    if z[0] > settings.z_in:
        raise ValueError(
            f"first output z={z[0]} precedes z_in={settings.z_in}")
    if cfg is not None:
        # growth-table range: the reference ABORTS on a outside
        # [growth_a_min, growth_a_max] (AU_cosmological_parameters.h:
        # 644-649); the table lookup here would silently edge-extrapolate
        a_lo = 1.0 / (1.0 + settings.z_in)
        a_hi = 1.0 / (1.0 + float(z[-1]))
        if a_lo < cfg.growth_a_min or a_hi > cfg.growth_a_max:
            raise ValueError(
                f"a range [{a_lo:.3e}, {a_hi:.3e}] (z_in={settings.z_in}, "
                f"z_out min={z[-1]}) exceeds the growth table "
                f"[{cfg.growth_a_min}, {cfg.growth_a_max}] — the "
                f"reference aborts here; widen growth_a_min/max or "
                f"adjust z_in/z_out")


def solve(cfg: SolverConfig, settings: RunSettings, model: mdl.Model,
          mode: str = "auto", ec=None) -> RunResult:
    """Full evolution + output assembly for one prepared model.  Jittable
    with cfg/settings static; pass ec=engine_consts(cfg, mode) from outside
    jit so the engine's large static arrays are parameters, not baked
    constants (TPU compile-time critical)."""
    _check_settings(settings, cfg)
    ys, _ = trg.evolve(cfg, settings, model, mode, ec)
    return _finalize(cfg, settings, model, ys, mode, ec)


def _finalize(cfg: SolverConfig, settings: RunSettings, model: mdl.Model,
              ys, mode: str, ec) -> RunResult:
    """Output assembly from the evolved states [n_eta, NU_STATE, nk]."""
    g = make_grids(cfg)
    z_arr = np.asarray(settings.z_out, dtype=np.float64)
    a_arr = 1.0 / (1.0 + z_arr)

    # one traced output-block graph, vmapped over the output redshifts
    # (compile-size critical: the block contains a full FAST-PT evaluation)
    table = jax.vmap(
        lambda yi, zi: build_output_block(cfg, settings, model, yi, zi,
                                          mode, ec))(ys, jnp.asarray(z_arr))
    # the reference evaluates sigma_v^2 at the HARDCODED k = 1e-3
    # (AU_cosmological_parameters.h:963-970) independent of the grid; on
    # the default grid that is exactly the first solver column
    wsv = (None if cfg.kmin == 1e-3 else
           jnp.asarray(interp.weight_matrix_np(
               np.log(np.asarray(g.k)),
               np.asarray([np.log(np.clip(1e-3, g.k[0], g.k[-1]))]))[0]))
    svs = jax.vmap(lambda zi: mdl.sigma_v2(model, zi, wsv))(
        jnp.asarray(z_arr))
    Hs = bg.H_H0(model.cosmo, jnp.asarray(a_arr)) * H0H

    return RunResult(
        k=jnp.asarray(g.k), table=table,
        eta=jnp.asarray(settings.etasteps()), a=jnp.asarray(a_arr),
        z=jnp.asarray(z_arr), H=Hs, sigma_v2=svs,
        sigmaV2_z0=model.sigmaV2_z0,
        eta_fin=jnp.asarray(np.log(1.0 / settings.a_in)))


@functools.lru_cache(maxsize=32)
def _jitted_solve_packed(cfg: SolverConfig, settings: RunSettings,
                         mode: str, n_lanes: int, mesh=None,
                         axis: str = "batch"):
    """Work-queue batch solve (trg.evolve_packed) + vmapped finalize.

    With a mesh, each device runs its OWN work queue over its shard of the
    batch axis (shard_map): the queues are independent — the Time-RG math
    has no cross-cosmology coupling — so no collectives are needed beyond
    the output gather, and per-device adaptive trajectories stay fully
    asynchronous across the mesh."""
    def fn(ms, ec):
        if mesh is None:
            ys = trg.evolve_packed(cfg, settings, ms, n_lanes, mode, ec)
        else:
            from jax.sharding import PartitionSpec as P
            # check_vma=False: the per-device queues are embarrassingly
            # parallel (no collectives inside), and the RK stage loop's
            # zeros-initialized carry trips the varying-manual-axes
            # tracker for no semantic reason
            ys = jax.shard_map(
                lambda msl, ecl: trg.evolve_packed(
                    cfg, settings, msl, n_lanes, mode, ecl),
                mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
                check_vma=False,
            )(ms, ec)
        return jax.vmap(
            lambda m, ym: _finalize(cfg, settings, m, ym, mode, ec))(ms, ys)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.jit(fn, out_shardings=NamedSharding(mesh, P(axis)))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_seg_init(cfg: SolverConfig, settings: RunSettings):
    return jax.jit(jax.vmap(
        lambda m: trg.evolve_init(cfg, settings, m)))


@functools.lru_cache(maxsize=64)
def _jitted_solve_segment(cfg: SolverConfig, settings: RunSettings,
                          mode: str, mesh=None, axis: str = "batch"):
    """One output-interval step of the segmented scheduler, vmapped over
    the chunk.  t0/t1 are traced scalars, so one executable serves every
    interval of the solve."""
    def seg(m, ec, y, h, t0, t1):
        return trg.evolve_segment(cfg, settings, m, y, h, t0, t1, mode, ec)

    fn = jax.vmap(seg, in_axes=(0, None, 0, 0, None, None))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(axis))
        return jax.jit(fn, out_shardings=(sh, sh))
    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jitted_finalize_batch(cfg: SolverConfig, settings: RunSettings,
                           mode: str, mesh=None, axis: str = "batch"):
    fn = jax.vmap(lambda m, ys, ec: _finalize(cfg, settings, m, ys,
                                              mode, ec),
                  in_axes=(0, 0, None))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.jit(fn, out_shardings=NamedSharding(mesh, P(axis)))
    return jax.jit(fn)


def _run_batch_segmented(cfg: SolverConfig, settings: RunSettings,
                         cs: CosmoParams, lins, mode: str,
                         norm_override=None, mesh=None,
                         axis: str = "batch",
                         max_chunk: int | None = None,
                         seg_breaks=None) -> RunResult:
    """Dispatch-bounded chunked batch: same math as the chunked scheduler,
    but each chunk's device work is issued as ONE PROGRAM PER OUTPUT
    INTERVAL (trg.evolve_segment) instead of one program for the whole
    solve.

    Why: on the axon TPU tunnel a single device program running longer
    than ~60-100 s faults the worker (measured round 5 at nk=512:
    chunk-64 and packed-64 single-program solves fault reproducibly
    while back-to-back ~50 s chunk-32 programs run fine), which caps the
    one-program chunked scheduler at chunk 32 on the HIGH_ACCURACY grid.
    Splitting at the output boundaries keeps every program under the
    wall while the chunk size keeps amortizing the 2.6 GB shared Ozaki
    packs along the measured affine cost law T(n) = 4.4 ms + 0.72 ms*n
    (docs/TPU_NOTES.md).  The interval programs queue back-to-back
    asynchronously, so the extra dispatches cost only enqueue latency.

    seg_breaks: optional extra eta breakpoints inserted into the
    interval list (the z_in -> z_out[0] span holds ~70% of the step
    attempts at tight tolerances; subdividing it bounds the worst
    program).  Breakpoints only clip controller steps — the same
    mechanism as output times — so accuracy is unchanged.
    """
    dev = _target_device()
    n = _batch_size(cs)
    if max_chunk is None:
        max_chunk = (int(os.environ.get("REDTIME_MAX_CHUNK", "64"))
                     if dev.platform != "cpu" else n)
    if mesh is not None and max_chunk % mesh.devices.size != 0:
        max_chunk = max_chunk - (max_chunk % mesh.devices.size) \
            or mesh.devices.size
    if n > max_chunk:
        tonp = lambda x: np.asarray(x)
        cs = jax.tree_util.tree_map(tonp, cs)
        lins = jax.tree_util.tree_map(tonp, lins)
        nrm_np = (None if norm_override is None
                  else np.asarray(norm_override))
        outs = []
        for i0 in range(0, n, max_chunk):
            take = lambda x: x[i0:i0 + max_chunk]
            ccs = jax.tree_util.tree_map(take, cs)
            cls_ = jax.tree_util.tree_map(take, lins)
            cnrm = None if nrm_np is None else take(nrm_np)
            pad = max_chunk - _batch_size(ccs)
            if pad:
                grow = lambda x: np.concatenate(
                    [x, np.repeat(x[:1], pad, axis=0)], axis=0)
                ccs = jax.tree_util.tree_map(grow, ccs)
                cls_ = jax.tree_util.tree_map(grow, cls_)
                cnrm = None if cnrm is None else grow(cnrm)
            outs.append(_run_batch_segmented(
                cfg, settings, ccs, cls_, mode, cnrm, mesh, axis,
                max_chunk, seg_breaks))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0)[:n], *outs)

    pad = 0
    if mesh is not None:
        nd = mesh.devices.size
        pad = (-n) % nd
        if pad:
            grow = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
            cs = jax.tree_util.tree_map(grow, cs)
            lins = jax.tree_util.tree_map(grow, lins)
            if norm_override is not None:
                norm_override = grow(jnp.asarray(norm_override))
    wn = norm_override is not None
    nrm = (jnp.asarray(norm_override),) if wn else ()
    if dev.platform != "cpu" or mesh is not None:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ms = _jitted_prepare(cfg, True, wn)(
                jax.device_put(cs, cpu), jax.device_put(lins, cpu),
                *jax.device_put(nrm, cpu))
            jax.block_until_ready(ms)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ms = jax.device_put(ms, NamedSharding(mesh, P(axis)))
            ec = _device_ec(cfg, mode, NamedSharding(mesh, P()))
        else:
            ms = jax.device_put(ms, dev)
            ec = _device_ec(cfg, mode, dev)
    else:
        ms = _jitted_prepare(cfg, True, wn)(cs, lins, *nrm)
        ec = _device_ec(cfg, mode, dev)

    y, h = _jitted_seg_init(cfg, settings)(ms)
    seg_fn = _jitted_solve_segment(cfg, settings, mode, mesh, axis)
    etasteps = np.asarray(settings.etasteps())
    bounds = np.concatenate([[0.0], etasteps])
    breaks = sorted(set(float(b) for b in (seg_breaks or ())))
    states = []
    for i in range(len(etasteps)):
        t0, t1 = float(bounds[i]), float(bounds[i + 1])
        inner = [b for b in breaks if t0 < b < t1]
        for a0, a1 in zip([t0] + inner, inner + [t1]):
            y, h = seg_fn(ms, ec, y, h, jnp.asarray(a0), jnp.asarray(a1))
        states.append(y)
    ys = jnp.stack(states, axis=1)          # [n, n_eta, NU_STATE*nk]
    ys = ys.reshape(ys.shape[0], len(etasteps), trg.NU_STATE, -1)
    res = _jitted_finalize_batch(cfg, settings, mode, mesh, axis)(
        ms, ys, ec)
    if pad:
        res = jax.tree_util.tree_map(lambda x: x[:n], res)
    return res


def run_pipeline(cfg: SolverConfig, settings: RunSettings, c: CosmoParams,
                 lin: LinearData, mode: str = "auto",
                 use_jit: bool = True,
                 prepare_on_host: bool | None = None,
                 norm_override=None) -> RunResult:
    """prepare_model + solve, jitted end-to-end.

    On an accelerator backend the per-cosmology setup runs on the host CPU
    backend and only the solver runs on the device (the setup is
    IO-adjacent and cheap; f64 growth while_loops also fault the current
    TPU runtime), controlled by prepare_on_host (default: host when the
    default backend is an accelerator).

    norm_override: P_lin normalization constant for injected-linear inputs
    (redtime_tpu.inject) instead of the sigma_8 integral."""
    wn = norm_override is not None
    nrm = (jnp.asarray(norm_override),) if wn else ()

    dev = _target_device()
    if prepare_on_host is None:
        prepare_on_host = dev.platform != "cpu"

    if use_jit and prepare_on_host:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            m = _jitted_prepare(cfg, False, wn)(
                jax.device_put(c, cpu), jax.device_put(lin, cpu),
                *jax.device_put(nrm, cpu))
            jax.block_until_ready(m)
        m = jax.device_put(m, dev)
        return _jitted_solve(cfg, settings, mode, False)(
            m, _device_ec(cfg, mode, dev))

    if use_jit:
        return _jitted_pipeline(cfg, settings, mode, False, with_norm=wn)(
            c, lin, _device_ec(cfg, mode, dev), *nrm)

    from redtime_tpu.fastpt import engine_consts
    m = mdl.prepare_model(cfg, c, lin, norm_override=norm_override)
    return solve(cfg, settings, m, mode, engine_consts(cfg, mode))


def finite_report(res: RunResult) -> np.ndarray:
    """Indices of batch lanes with non-finite output (per-model fault
    isolation: one diverged cosmology poisons only its own lane, unlike the
    reference's fail-fast serial loop, runRedTimeBatch:2).  Checks the
    header scalars too (sigma_v2/H come from the growth/background code
    paths, separate from the evolved table)."""
    table = np.asarray(res.table)
    batched = table.ndim == 4
    nb = table.shape[0] if batched else 1

    def lane_ok(x):
        a = np.asarray(x).reshape(nb, -1) if batched \
            else np.asarray(x).reshape(1, -1)
        return np.isfinite(a).all(axis=1)

    ok = lane_ok(table)
    for x in (res.sigma_v2, res.H, res.sigmaV2_z0):
        ok = ok & lane_ok(x)
    return np.nonzero(~ok)[0]


def _batch_size(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


# Chunking pipelines host prepare with device solve: solves dispatch
# asynchronously, so chunk i+1's host-side prepare overlaps chunk i's
# device execution.  (Round 2's apparent "batch>32 faults the runtime"
# was NOT a dispatch-size limit: larger synthetic batches included
# early-DE-dominated cosmologies whose growth-table scale overflowed the
# TPU's f32-exponent-range f64 — fixed by the prepare_model rescale; one
# dispatch of 64 now completes fine.)
# With the Ozaki MXU engine the full-TRG sweet spot moved from 8 to 16
# (measured e2e at batch 32: chunk 8 = 1683/min, 12 = 1783, 16 = 2058,
# 32 = 1544 — larger chunks amortize the per-iteration fixed costs until
# lockstep waste and lost prep overlap take over); the cheap 1-loop path
# prefers one big dispatch.
DEFAULT_TPU_CHUNK = 32
DEFAULT_TPU_CHUNK_FULL = 16


def _default_chunk(settings: RunSettings) -> int:
    if settings.nonlinear and not settings.one_loop:
        return DEFAULT_TPU_CHUNK_FULL
    return DEFAULT_TPU_CHUNK


def _run_batch_packed(cfg: SolverConfig, settings: RunSettings,
                      cs: CosmoParams, lins, mode: str,
                      norm_override=None, mesh=None,
                      axis: str = "batch",
                      n_lanes: int | None = None) -> RunResult:
    """Packed work-queue batch: prepare all models (host CPU on
    accelerators — cheap and immune to device wedges), move the stacked
    pytree across once, then ONE device program in which lanes pull
    cosmologies off the queue as they finish (trg.evolve_packed).
    Removes the chunked scheduler's per-segment lockstep syncs (~6%
    solve-only on homogeneous batches, more when stiffness varies);
    the chunked path keeps the end-to-end edge on uniform batches via
    host-prepare/device-solve overlap.

    With a mesh the batch is padded to a multiple of the device count and
    each device runs an independent queue over its shard (shard_map)."""
    dev = _target_device()
    n = _batch_size(cs)
    pad = 0
    if mesh is not None:
        nd = mesh.devices.size
        pad = (-n) % nd
        if pad:
            grow = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
            cs = jax.tree_util.tree_map(grow, cs)
            lins = jax.tree_util.tree_map(grow, lins)
            if norm_override is not None:
                norm_override = grow(jnp.asarray(norm_override))
        lanes = min(n_lanes
                    or int(os.environ.get("REDTIME_LANES", "8")),
                    (n + pad) // nd)
    else:
        lanes = min(n_lanes
                    or int(os.environ.get("REDTIME_LANES", "8")), n)
    wn = norm_override is not None
    nrm = (jnp.asarray(norm_override),) if wn else ()
    if dev.platform != "cpu" or mesh is not None:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ms = _jitted_prepare(cfg, True, wn)(
                jax.device_put(cs, cpu), jax.device_put(lins, cpu),
                *jax.device_put(nrm, cpu))
            jax.block_until_ready(ms)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ms = jax.device_put(ms, NamedSharding(mesh, P(axis)))
            ec = _device_ec(cfg, mode, NamedSharding(mesh, P()))
        else:
            ms = jax.device_put(ms, dev)
            ec = _device_ec(cfg, mode, dev)
    else:
        ms = _jitted_prepare(cfg, True, wn)(cs, lins, *nrm)
        ec = _device_ec(cfg, mode, dev)
    res = _jitted_solve_packed(cfg, settings, mode, lanes, mesh, axis)(
        ms, ec)
    if pad:
        res = jax.tree_util.tree_map(lambda x: x[:n], res)
    return res


def run_batch(cfg: SolverConfig, settings: RunSettings, cs: CosmoParams,
              lins: LinearData, mode: str = "auto",
              mesh=None, axis: str = "batch",
              prepare_on_host: bool | None = None,
              max_chunk: int | None = None,
              norm_override=None, scheduler: str = "auto",
              n_lanes: int | None = None,
              seg_breaks=None) -> RunResult:
    """Batched pipeline: vmap over stacked cosmologies, optionally sharded
    over a device mesh along the batch axis (embarrassingly parallel — the
    Time-RG math has no cross-cosmology coupling, so the only communication
    is the output gather; SURVEY section 5.8).

    max_chunk: split the batch into device sub-batches of at most this many
    cosmologies (padded to equal shape so every chunk hits the same compiled
    executable).  Defaults to 32 on accelerators, unchunked on CPU.
    """
    n = _batch_size(cs)
    if scheduler == "auto":  # explicit arg wins over the env knob
        scheduler = os.environ.get("REDTIME_SCHEDULER", "auto")
    if scheduler == "auto":
        # measured (TPU, homogeneous batch of 32): packed solve-only is
        # ~6% faster than chunked (it removes per-segment lockstep syncs)
        # but loses end-to-end because chunked overlaps host prepare with
        # device solve across sub-batches.  The real lockstep waste is
        # only ~15% (max-over-lanes vs per-model-mean attempts), so
        # chunked stays the default; choose packed explicitly for
        # heterogeneous batches with widely varying stiffness.
        scheduler = "chunked"
    if scheduler == "packed":
        return _run_batch_packed(cfg, settings, cs, lins, mode,
                                 norm_override, mesh, axis, n_lanes)
    if scheduler == "segmented":
        return _run_batch_segmented(cfg, settings, cs, lins, mode,
                                    norm_override, mesh, axis, max_chunk,
                                    seg_breaks)
    if scheduler != "chunked":
        raise ValueError(f"unknown scheduler {scheduler!r}; choose "
                         "'auto', 'chunked', 'packed', or 'segmented'")
    if max_chunk is None:
        max_chunk = int(os.environ.get("REDTIME_MAX_CHUNK",
                                       _default_chunk(settings))) \
            if _target_device().platform != "cpu" else n
    if mesh is not None and max_chunk % mesh.devices.size != 0:
        max_chunk = max_chunk - (max_chunk % mesh.devices.size) \
            or mesh.devices.size
    if n > max_chunk:
        # slice/pad chunks HOST-SIDE: device-resident inputs would turn
        # every slice into a remote op (the axon tunnel charges ~real
        # latency per dispatch); inputs are host-origin file data anyway
        tonp = lambda x: np.asarray(x)
        cs = jax.tree_util.tree_map(tonp, cs)
        lins = jax.tree_util.tree_map(tonp, lins)
        nrm_np = (None if norm_override is None
                  else np.asarray(norm_override))
        outs = []
        for i0 in range(0, n, max_chunk):
            take = lambda x: x[i0:i0 + max_chunk]
            ccs = jax.tree_util.tree_map(take, cs)
            cls_ = jax.tree_util.tree_map(take, lins)
            cnrm = None if nrm_np is None else take(nrm_np)
            pad = max_chunk - _batch_size(ccs)
            if pad:
                grow = lambda x: np.concatenate(
                    [x, np.repeat(x[:1], pad, axis=0)], axis=0)
                ccs = jax.tree_util.tree_map(grow, ccs)
                cls_ = jax.tree_util.tree_map(grow, cls_)
                cnrm = None if cnrm is None else grow(cnrm)
            outs.append(run_batch(cfg, settings, ccs, cls_, mode, mesh,
                                  axis, prepare_on_host, max_chunk, cnrm))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0)[:n], *outs)

    wn = norm_override is not None
    nrm = (jnp.asarray(norm_override),) if wn else ()

    dev = _target_device()
    if prepare_on_host is None:
        prepare_on_host = dev.platform != "cpu"

    if prepare_on_host:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ms = _jitted_prepare(cfg, True, wn)(
                jax.device_put(cs, cpu), jax.device_put(lins, cpu),
                *jax.device_put(nrm, cpu))
            jax.block_until_ready(ms)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(axis))
            ms = jax.device_put(ms, sh)
            ec = _device_ec(cfg, mode, NamedSharding(mesh, P()))
            return _jitted_solve(cfg, settings, mode, True, mesh, axis)(
                ms, ec)
        return _jitted_solve(cfg, settings, mode, True)(
            jax.device_put(ms, dev), _device_ec(cfg, mode, dev))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(axis))
        cs = jax.device_put(cs, sh)
        lins = jax.device_put(lins, sh)
        ec = _device_ec(cfg, mode, NamedSharding(mesh, P()))
        nrm = jax.device_put(nrm, sh)
    else:
        ec = _device_ec(cfg, mode, dev)
    return _jitted_pipeline(cfg, settings, mode, True, mesh, axis,
                            with_norm=wn)(cs, lins, ec, *nrm)


def settings_from_params(p: ParamsFile) -> tuple[RunSettings, CosmoParams]:
    settings = RunSettings(
        nonlinear=bool(p.switch_nonlinear), one_loop=bool(p.switch_1loop),
        print_lin=bool(p.print_lin), print_rsd=bool(p.print_rsd),
        z_in=p.z_in, z_out=tuple(p.z_out))
    cosmo = CosmoParams.make(p.n_s, p.sigma_8, p.h, p.Omega_m, p.Omega_b,
                             p.Omega_nu, p.T_cmb, p.w0, p.wa)
    return settings, cosmo
