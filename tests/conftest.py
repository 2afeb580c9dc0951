"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is a single chip in this environment; sharding tests use
XLA's host-platform device virtualization instead (SURVEY.md §4 implication).
"""

import os
import sys

# Force CPU: the environment presets JAX_PLATFORMS to a (slow, single-chip)
# remote TPU tunnel, and the site customization imports jax at interpreter
# startup — so the env var is already baked into jax's config. Update the
# config object directly (backends are not initialized yet at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# NOTE: do NOT enable the persistent compile cache here — XLA:CPU AOT
# artifacts bake in compile-machine vector features and warn/SIGILL when the
# execution host differs (observed with +prefer-no-scatter). The cache is for
# the slow remote-TPU compiler only (bench.py / __graft_entry__.py).

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled executables between test modules: one long-lived
    process accumulating ~100 XLA:CPU compilations eventually segfaults
    inside backend_compile (observed at test #120 of the full suite)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
