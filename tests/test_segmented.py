"""Segmented-dispatch batch scheduler vs the chunked scheduler.

driver._run_batch_segmented issues one device program per output
interval (trg.evolve_segment with traced bounds) instead of one program
per whole solve — the round-5 answer to the axon tunnel's
single-dispatch duration wall at nk=512 (docs/TPU_NOTES.md).  With no
extra breakpoints the integrator visits exactly the same interval
boundaries as the chunked solve's segment scan; the different program
partitioning can still flip borderline step acceptances (XLA fusion
changes the error norm by ~1 ulp), so agreement bars are the
controller band, like the packed scheduler.  Inserted seg_breaks only
clip controller steps (the same mechanism as an output time), so
results stay inside that band too.
"""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _cosmo, _example_inputs
from redtime_tpu import driver
from redtime_tpu.config import RunSettings, SolverConfig

CFG = SolverConfig(nk=32, fft_mode="fft")
SETTINGS = RunSettings(one_loop=False, z_out=(2.0, 1.0, 0.5, 0.0))


def _batch(n, cfg=CFG):
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[_cosmo(i) for i in range(n)])
    lins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *([lin] * n))
    return cosmos, lins


def test_segmented_matches_chunked():
    """Same interval boundaries and controller arithmetic; the programs
    are partitioned differently, so XLA fusion differences can flip a
    borderline step acceptance (a 1-ulp change in the error norm at the
    accept threshold) — agreement is within the controller band, like
    the packed scheduler (measured 2.7e-7 of column scale at this grid;
    linear columns exact)."""
    cosmos, lins = _batch(3)
    r_ch = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                            scheduler="chunked")
    r_sg = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                            scheduler="segmented")
    tc, ts = np.asarray(r_ch.table), np.asarray(r_sg.table)
    assert tc.shape == ts.shape
    scale = np.max(np.abs(tc), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(ts - tc) / scale) < 3e-5
    # linear-theory columns bypass the integrator: ulp-level only (the
    # different program partitioning still re-fuses the finalize graph)
    np.testing.assert_allclose(ts[..., :7], tc[..., :7], rtol=1e-13)
    np.testing.assert_array_equal(np.asarray(r_ch.z), np.asarray(r_sg.z))
    np.testing.assert_array_equal(np.asarray(r_ch.sigma_v2),
                                  np.asarray(r_sg.sigma_v2))


def test_segmented_chunks_match_unchunked():
    """The host-side chunk loop (pad + concat) must be transparent up to
    the controller band (the chunk-2 and batch-5 programs have different
    vmap widths, so XLA fusion can flip borderline step acceptances —
    same class of deviation as chunked-vs-segmented)."""
    cosmos, lins = _batch(5)
    r_one = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented")
    r_chk = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented", max_chunk=2)
    t1, t2 = np.asarray(r_one.table), np.asarray(r_chk.table)
    scale = np.max(np.abs(t1), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(t2 - t1) / scale) < 3e-5


def test_segmented_seg_break_equals_output_time():
    """A seg_break at eta_x is EXACTLY an output boundary without the
    output: the controller clips the step there and carries h across,
    the same arithmetic as an output time.  So segmented-with-break must
    match (within the reproducibility band) a chunked solve whose z_out
    includes the corresponding redshift, with that block dropped."""
    z_x = 1.5
    a_in = SETTINGS.a_in
    eta_x = float(np.log((1.0 / (1.0 + z_x)) / a_in))
    settings_with = RunSettings(one_loop=False,
                                z_out=(2.0, z_x, 1.0, 0.5, 0.0))
    cosmos, lins = _batch(2)
    r_ref = driver.run_batch(CFG, settings_with, cosmos, lins, mode="fft",
                             scheduler="chunked")
    r_sub = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented", seg_breaks=(eta_x,))
    tr = np.asarray(r_ref.table)[:, [0, 2, 3, 4]]   # drop the z_x block
    ts = np.asarray(r_sub.table)
    assert tr.shape == ts.shape
    scale = np.max(np.abs(tr), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(ts - tr) / scale) < 3e-5


def test_segmented_seg_breaks_finite_and_in_controller_accuracy():
    """Arbitrary extra breakpoints perturb the step sequence, so results
    move within the CONTROLLER ACCURACY (erel_P=1e-2 here — percent-level
    local error control; measured ~2.4e-3 of column scale at this grid),
    not the reproducibility band.  At the HIGH_ACCURACY tolerances where
    segmented matters (erel 1e-6) the same perturbation is ~1e-6."""
    cosmos, lins = _batch(2)
    r_ref = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented")
    eta1 = float(np.asarray(SETTINGS.etasteps())[0])
    r_sub = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented",
                             seg_breaks=(0.25 * eta1, 0.5 * eta1,
                                         0.75 * eta1))
    tr, ts = np.asarray(r_ref.table), np.asarray(r_sub.table)
    scale = np.max(np.abs(tr), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(ts - tr) / scale) < 1e-2
    assert np.isfinite(ts).all()


def test_segmented_one_loop_mode():
    """1-loop mode rebuilds the A/R/PT cache inside each interval
    program; results must match the chunked 1-loop solve within the
    controller band."""
    settings_1l = RunSettings(one_loop=True, z_out=(2.0, 1.0, 0.0))
    cosmos, lins = _batch(2)
    r_ch = driver.run_batch(CFG, settings_1l, cosmos, lins, mode="fft",
                            scheduler="chunked")
    r_sg = driver.run_batch(CFG, settings_1l, cosmos, lins, mode="fft",
                            scheduler="segmented")
    tc, ts = np.asarray(r_ch.table), np.asarray(r_sg.table)
    scale = np.max(np.abs(tc), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(ts - tc) / scale) < 3e-5


def test_segmented_under_mesh():
    """Per-interval dispatch composes with the batch-axis mesh sharding
    (pad to device count, independent per-device trajectories)."""
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        import pytest
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(cpus[:4]), ("batch",))
    cosmos, lins = _batch(6)   # pads 6 -> 8 over 4 devices
    r_ref = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented")
    r_msh = driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                             scheduler="segmented", mesh=mesh)
    tr, tm = np.asarray(r_ref.table), np.asarray(r_msh.table)
    assert tm.shape == tr.shape
    scale = np.max(np.abs(tr), axis=(0, 2), keepdims=True) + 1e-300
    assert np.max(np.abs(tm - tr) / scale) < 3e-5


def test_unknown_scheduler_raises():
    cosmos, lins = _batch(1)
    import pytest
    with pytest.raises(ValueError, match="unknown scheduler"):
        driver.run_batch(CFG, SETTINGS, cosmos, lins, mode="fft",
                         scheduler="bogus")
