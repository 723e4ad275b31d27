"""Test configuration: force an 8-device virtual CPU backend so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 — the
JAX-native fake-backend mechanism).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
at interpreter startup, so env vars alone are too late — we must override via
jax.config before any backend is initialized.
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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
