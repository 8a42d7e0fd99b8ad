"""Work-queue (packed) batch scheduler vs the chunked vmap scheduler.

trg.evolve_packed lets each lane advance its own adaptive trajectory and
pull the next cosmology off a queue on completion, removing the chunked
scheduler's per-segment max-over-lanes lockstep waste (measured ~4x on
production batches).  Trajectories apply the same controller arithmetic,
so outputs must agree within the controller's tolerance band.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _cosmo, _example_inputs
from redtime_tpu import driver, trg
from redtime_tpu.config import RunSettings, SolverConfig

CFG = SolverConfig(nk=32, fft_mode="fft")
SETTINGS = RunSettings(one_loop=False, z_out=(2.0, 1.0, 0.5, 0.0))


def _batch(n):
    lin = _example_inputs(CFG)
    cosmos = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[_cosmo(i) for i in range(n)])
    lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * n))
    return cosmos, lins


def test_packed_matches_chunked():
    """Fewer lanes than models, so lanes cycle through the queue."""
    cosmos, lins = _batch(5)
    r_ch = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                            scheduler="chunked")
    old = os.environ.get("REDTIME_LANES")
    os.environ["REDTIME_LANES"] = "3"
    try:
        r_pk = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                                scheduler="packed")
    finally:
        if old is None:
            os.environ.pop("REDTIME_LANES", None)
        else:
            os.environ["REDTIME_LANES"] = old
    tc, tp = np.asarray(r_ch.table), np.asarray(r_pk.table)
    assert tc.shape == tp.shape
    # controller tolerance band (erel_P = 1e-2 drives ~1e-6 trajectory
    # reproducibility across different batch lowerings)
    np.testing.assert_allclose(tp, tc, rtol=3e-5, atol=1e-12)
    # per-model z/eta metadata identical
    np.testing.assert_array_equal(np.asarray(r_ch.z), np.asarray(r_pk.z))


def test_packed_single_model_matches_evolve():
    cosmos, lins = _batch(1)
    lin = _example_inputs(CFG)
    m = driver._jitted_prepare(CFG, False)(_cosmo(0), lin)
    ys_seq, _ = jax.jit(
        lambda mm: trg.evolve(CFG, SETTINGS, mm, "fft"))(m)
    ms = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], m)
    ys_pk = jax.jit(
        lambda mm: trg.evolve_packed(CFG, SETTINGS, mm, 1, "fft"))(ms)
    np.testing.assert_allclose(np.asarray(ys_pk[0]), np.asarray(ys_seq),
                               rtol=1e-6, atol=1e-8)


def test_packed_one_loop_matches_chunked():
    """1-loop lanes: per-model z1l caches are gathered through the queue
    reload alongside the models; outputs match the chunked scheduler
    within the controller band."""
    cosmos, lins = _batch(3)
    s1l = RunSettings(one_loop=True, z_out=(1.0, 0.0))
    r_ch = driver.run_batch(CFG, s1l, cosmos, lins, mode="fft",
                            scheduler="chunked")
    old = os.environ.get("REDTIME_LANES")
    os.environ["REDTIME_LANES"] = "2"
    try:
        r_pk = driver.run_batch(CFG, s1l, cosmos, lins, mode="fft",
                                scheduler="packed")
    finally:
        if old is None:
            os.environ.pop("REDTIME_LANES", None)
        else:
            os.environ["REDTIME_LANES"] = old
    # controller band: the packed lanes and the chunked solve take
    # different step trajectories, so near-zero RSD columns need an
    # absolute floor (same pairing as the single-model test above)
    np.testing.assert_allclose(np.asarray(r_pk.table),
                               np.asarray(r_ch.table),
                               rtol=3e-5, atol=1e-8)


def test_packed_f32_stepping_traces():
    """Regression: evolve_packed must cast the model/engine tables in
    f32 stepping mode like trg.evolve, or the while_loop carry dtype
    diverges at trace time.  (CPU f32 is slow — keep this tiny.)"""
    cfg = SolverConfig(nk=32, fft_mode="fft", dtype="float32")
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[_cosmo(i) for i in range(2)])
    lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * 2))
    settings = RunSettings(one_loop=False, z_out=(0.0,))
    res = driver.run_batch(cfg, settings, cosmos, lins, mode="fft",
                           scheduler="packed")
    assert bool(jnp.isfinite(res.table).all())


def test_packed_mesh_matches_chunked():
    """Sharded packed scheduler: every device runs its own queue over its
    batch shard (shard_map); a 5-model batch on 2 devices pads to 6 and
    slices back.  Results match the unsharded chunked scheduler."""
    from jax.sharding import Mesh
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs >= 2 virtual CPU devices")
    cosmos, lins = _batch(5)
    r_ch = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                            scheduler="chunked")
    mesh = Mesh(np.array(devs[:2]), ("batch",))
    old = os.environ.get("REDTIME_LANES")
    os.environ["REDTIME_LANES"] = "2"
    try:
        r_pk = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                                scheduler="packed", mesh=mesh)
    finally:
        if old is None:
            os.environ.pop("REDTIME_LANES", None)
        else:
            os.environ["REDTIME_LANES"] = old
    tc, tp = np.asarray(r_ch.table), np.asarray(r_pk.table)
    assert tc.shape == tp.shape
    np.testing.assert_allclose(tp, tc, rtol=3e-5, atol=1e-12)
