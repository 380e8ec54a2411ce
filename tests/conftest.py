"""Test config: force pure CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4d).

Note: this image's sitecustomize registers an `axon` (tunneled-TPU)
backend and forces jax_platforms="axon,cpu"; overriding the config
in-process *before* backend initialization is the only way to keep unit
tests off the tunnel (env JAX_PLATFORMS is ignored once register() ran).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
