"""Test config: force CPU jax with 8 virtual devices.

Tests must run without a TPU (SURVEY.md §4). The virtual 8-device mesh
exercises the multi-chip sharding paths (parallel/) exactly as the
driver's ``dryrun_multichip`` does.

This environment ships an ``axon`` TPU PJRT plugin that a
sitecustomize registers whenever PALLAS_AXON_POOL_IPS is set,
overriding JAX_PLATFORMS — drop that var before jax loads so the test
suite really runs on CPU.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this
# 1-core box (~18 min cold); cached recompiles cut re-runs to a
# fraction. Keyed by backend+HLO, safe across branches; .gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
