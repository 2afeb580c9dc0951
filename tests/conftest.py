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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
