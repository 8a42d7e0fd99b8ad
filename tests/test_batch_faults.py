"""Per-model fault isolation and sub-batch chunking of the batch path.

The reference's batch loop fails fast and loses the rest of the design on
the first bad model (`scripts/runRedTimeBatch:2`, `set -e`); the vmapped
batch instead isolates a diverged cosmology to its own lane
(`driver.finite_report`) and the chunked path bounds per-device batch size
(one v5e chip faults above batch 32 at the flagship configuration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redtime_tpu import driver
from redtime_tpu.driver import run_batch

from test_sharding import _tiny_setup


def test_poisoned_lane_is_isolated():
    n = 4
    cfg, settings, cosmos, lins = _tiny_setup(n)
    # poison lane 2 (NaN sigma_8 -> NaN normalization -> NaN spectra)
    poisoned = cosmos._replace(
        sigma_8=cosmos.sigma_8.at[2].set(jnp.nan))

    res = run_batch(cfg, settings, poisoned, lins, mode="fft",
                    prepare_on_host=False)
    bad = driver.finite_report(res)
    assert list(bad) == [2]

    # the healthy lanes are untouched by the poisoned one
    ref = run_batch(cfg, settings, cosmos, lins, mode="fft",
                    prepare_on_host=False)
    a, b = np.asarray(res.table), np.asarray(ref.table)
    for i in (0, 1, 3):
        np.testing.assert_array_equal(a[i], b[i])


def test_finite_report_clean():
    cfg, settings, cosmos, lins = _tiny_setup(3)
    res = run_batch(cfg, settings, cosmos, lins, mode="fft",
                    prepare_on_host=False)
    assert len(driver.finite_report(res)) == 0


@pytest.mark.parametrize("prepare_on_host", [False, True])
def test_chunked_batch_matches_direct(prepare_on_host):
    """Chunked lanes reuse one compiled executable; chunk [0:2] must equal
    a direct batch-of-2 bitwise, and the padded tail chunk must still
    produce the unpadded lane's result."""
    n = 5
    cfg, settings, cosmos, lins = _tiny_setup(n)
    res = run_batch(cfg, settings, cosmos, lins, mode="fft",
                    prepare_on_host=prepare_on_host, max_chunk=2)
    assert np.asarray(res.table).shape[0] == n
    assert len(driver.finite_report(res)) == 0

    take2 = lambda t: jax.tree_util.tree_map(lambda x: x[:2], t)
    direct = run_batch(cfg, settings, take2(cosmos), take2(lins),
                       mode="fft", prepare_on_host=prepare_on_host,
                       max_chunk=2)
    np.testing.assert_array_equal(np.asarray(res.table)[:2],
                                  np.asarray(direct.table))

    # tail lane 4 = lane 0 of a padded [4, 4] chunk: equals the [4, 4]
    # direct batch's first lane
    take44 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.stack([x[4], x[4]]), t)
    tail = run_batch(cfg, settings, take44(cosmos), take44(lins),
                     mode="fft", prepare_on_host=prepare_on_host,
                     max_chunk=2)
    np.testing.assert_array_equal(np.asarray(res.table)[4],
                                  np.asarray(tail.table)[0])