"""Test harness: force a virtual 8-device CPU platform BEFORE jax import.

Multi-chip sharding tests run against this fake mesh (SURVEY.md §4); real
TPU execution is exercised by bench.py / the driver instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
