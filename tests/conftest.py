"""Test configuration: force CPU with a virtual 8-device mesh and f64.

Must run before jax initializes a backend (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# In the axon-tunnel environment JAX_PLATFORMS is ignored and the TPU plugin
# always wins; pin the default device to the (virtual 8-device) CPU backend
# so tests are deterministic f64 regardless of the tunnel.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import pytest  # noqa: E402

REFERENCE = "/root/reference"
EXAMPLE = os.path.join(REFERENCE, "examples", "1_redTime")


@pytest.fixture(scope="session")
def example_dir():
    if not os.path.isdir(EXAMPLE):
        pytest.skip("reference example inputs not available")
    return EXAMPLE
