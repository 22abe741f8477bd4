"""Test environment: CPU backend with a virtual 8-device mesh.

Tests must run without a TPU (SURVEY.md §4 implication (b)/(c)):
force the host platform and split it into 8 virtual devices so the
sharding tests exercise real multi-device partitioning.

Note: this image's ``sitecustomize`` imports jax and registers an
experimental TPU-tunnel PJRT plugin before any user code runs, so
setting ``JAX_PLATFORMS`` via ``os.environ`` here is too late — use
``jax.config.update`` (the backend itself is not yet initialized when
conftest loads, so the platform choice still takes effect).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the unrolled LM-polish programs take tens
# of seconds of XLA CPU compile; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
