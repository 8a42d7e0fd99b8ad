"""Multi-device sharding tests on the virtual CPU mesh (8 devices via
xla_force_host_platform_device_count in conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from redtime_tpu import SolverConfig, RunSettings, run_batch


def _tiny_setup(n):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cosmo, _example_inputs

    cfg = SolverConfig(nk=16, np_factor=4, growth_n_lna=10, growth_n_lnk=6,
                       quad_panels=8, quad_order=8)
    settings = RunSettings(z_out=(1.0, 0.0))
    lin = _example_inputs(cfg)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo(i) for i in range(n)])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * n))
    return cfg, settings, cosmos, lins


@pytest.fixture(scope="module")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual CPU devices")
    return devs


def test_sharded_batch_matches_unsharded(cpu_devices):
    n = 4
    cfg, settings, cosmos, lins = _tiny_setup(n)
    mesh = Mesh(np.array(cpu_devices[:4]), ("batch",))

    r_plain = run_batch(cfg, settings, cosmos, lins, mode="fft",
                        prepare_on_host=False)
    r_shard = run_batch(cfg, settings, cosmos, lins, mode="fft", mesh=mesh,
                        prepare_on_host=False)
    a, b = np.asarray(r_plain.table), np.asarray(r_shard.table)
    assert a.shape == b.shape
    assert np.all(np.isfinite(b))
    # same math, device placement must not change physics beyond roundoff
    scale = np.max(np.abs(a), axis=-2, keepdims=True) + 1e-300
    assert np.max(np.abs(a - b) / scale) < 1e-7


def test_sharded_output_layout(cpu_devices):
    n = 4
    cfg, settings, cosmos, lins = _tiny_setup(n)
    mesh = Mesh(np.array(cpu_devices[:4]), ("batch",))
    res = run_batch(cfg, settings, cosmos, lins, mode="fft", mesh=mesh,
                    prepare_on_host=False)
    # the output really is sharded along the batch axis
    sh = res.table.sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P("batch")
