"""Test harness: force a virtual 8-device CPU platform.

The container's sitecustomize registers the axon TPU plugin and force-sets
``jax_platforms="axon,cpu"`` at interpreter start (overriding the
JAX_PLATFORMS env var), so the override must go through jax.config AFTER
import — env vars alone silently leave tests running on the real TPU.

Multi-chip sharding tests run against this fake 8-device mesh
(SURVEY.md §4); real TPU execution is exercised by bench.py / the driver.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
