"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding tests run against this virtual mesh
(``--xla_force_host_platform_device_count=8``); kernels run in Pallas
interpret mode. Real-TPU behavior is exercised by ``bench.py`` and the driver.
"""

import os

# The container pre-imports jax with JAX_PLATFORMS=axon (remote TPU tunnel)
# via sitecustomize, so plain env vars are too late — update jax.config
# directly before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "segment_anything"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
