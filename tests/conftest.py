"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment's sitecustomize registers an `axon` TPU PJRT plugin at
interpreter start and force-sets jax_platforms="axon,cpu" via
jax.config.update — plain env vars cannot override it, so we update the
config back to cpu here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
