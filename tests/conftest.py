"""Test env: force CPU with 8 virtual devices BEFORE jax import.

All sharding / all-to-all / shard_map tests run on the virtual mesh
(SURVEY.md §5.3); kernels run in Pallas interpret mode on CPU.
"""

import os

# Hard override: the image's sitecustomize registers the axon TPU PJRT
# backend at interpreter startup and pins JAX_PLATFORMS=axon, so the env
# var alone is not enough — update jax config directly before any
# computation. Tests must run on CPU with 8 virtual devices (and f32
# matmul parity).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
