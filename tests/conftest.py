"""Test configuration: run everything on a simulated 8-device CPU mesh.

The driver benches on real TPU; tests exercise the identical code paths on
CPU so multi-chip sharding can be validated without hardware (SURVEY.md §4).

Note: the environment's axon TPU plugin overrides ``JAX_PLATFORMS`` from
inside ``jax.config`` during its sitecustomize registration, so setting the
env var is not enough — the config must be updated *after* ``import jax``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
