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

# Test tiers (markers declared in pyproject.toml): per-file classification
# so CI / future rounds can spot-verify in minutes instead of the ~25-min
# full suite on this 1-core box. `pytest -m quick` = fast unit tier;
# `-m mesh` = the 3-6-min multi-device files; `-m parity` = the
# reference-torch-as-oracle files; `-m slow` = subprocess/e2e integration.
_MESH_FILES = {
    "test_mesh_train", "test_tool_sharding", "test_multihost",
    "test_sharding",
}
_PARITY_FILES = {"test_reference_parity", "test_reference_interop"}
_SLOW_FILES = {
    "test_integration", "test_multistate", "test_deploy", "test_serve",
    "test_cli_e2e", "test_tools_cli", "test_reference_ab",
}
# whole-model jit-compile-heavy unit files (measured 25-330 s each on the
# 1-core CPU box): real units, but too slow for the quick tier
_COMPILE_FILES = {
    "test_train_step", "test_quant", "test_model", "test_benchlib",
    "test_il_methods", "test_checkpoint", "test_eval_dedup",
    "test_stem_fused",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.fspath.purebasename
        if name in _MESH_FILES:
            item.add_marker(pytest.mark.mesh)
        elif name in _PARITY_FILES:
            item.add_marker(pytest.mark.parity)
        elif name in _COMPILE_FILES:
            item.add_marker(pytest.mark.compile)
        elif name in _SLOW_FILES:
            if not item.get_closest_marker("slow"):
                item.add_marker(pytest.mark.slow)
        elif not item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
