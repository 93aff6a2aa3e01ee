"""Test configuration: force an 8-device virtual CPU mesh.

This is the idiomatic JAX answer to testing multi-chip sharding without
hardware (SURVEY.md §4c): XLA's host platform is split into 8 virtual
devices, so pjit/shard_map paths execute real collectives locally.
Must run before jax is imported anywhere.
"""

import os

# Hard-set (the environment pre-sets JAX_PLATFORMS for the TPU tunnel; tests
# must run on the virtual CPU mesh regardless).
os.environ["JAX_PLATFORMS"] = "cpu"
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
    return np.random.default_rng(1234)
