"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual device mesh
(``--xla_force_host_platform_device_count=8``) because the CI host has a
single real TPU chip.  Must run before the first ``import jax``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config API
# (must happen before any device access).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
