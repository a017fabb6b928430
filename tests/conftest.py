"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests (SURVEY.md §4); this suite creates the
test strategy for the TPU rebuild. All tests run on CPU with
``xla_force_host_platform_device_count=8`` so multi-device sharding paths are
exercised without TPU hardware (the standard JAX fake-backend trick).

Note: the environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU PJRT plugin), so env vars set here would be read too late —
we must switch platforms through ``jax.config`` instead.
"""

import os

# MFPA_TEST_TPU=1 leaves the real accelerator in place so the TPU-gated
# tests (tests/test_pallas_tpu.py) actually compile on hardware:
#   MFPA_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q
_use_tpu = os.environ.get("MFPA_TEST_TPU") == "1"

# XLA_FLAGS is only consumed at (lazy) backend initialization, which has not
# happened yet at conftest-import time, so this still takes effect.
_flags = os.environ.get("XLA_FLAGS", "")
if not _use_tpu and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this image has a single CPU core, so XLA
# compile time dominates the suite — cached executables make re-runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(59)  # reference global seed: training/utils.py:65-73
