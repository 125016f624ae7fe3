"""Test configuration: hermetic CPU runs with 8 virtual devices.

Real-TPU validation happens via bench.py / __graft_entry__.py; unit tests run
on the host CPU backend (8 virtual devices so parallel/ sharding paths are
exercised). Note: we do NOT set JAX_PLATFORMS=cpu — under the axon TPU tunnel
that deadlocks the PJRT relay. Instead the TPU backend is left registered and
the default device is pinned to CPU.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_mesh(shape, axis_names):
    """An n-device CPU mesh for sharding tests."""
    devs = np.asarray(jax.devices("cpu")[: int(np.prod(shape))]).reshape(shape)
    return jax.sharding.Mesh(devs, axis_names)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
