"""Test configuration.

Correctness CI runs on the CPU backend (same XLA semantics, no TPU needed) —
SURVEY.md §4.  Multi-chip sharding tests use 8 virtual CPU devices via
``xla_force_host_platform_device_count``.  These env vars must be set before
JAX initializes its backends, hence this module-level block.
"""

import os
import sys

if "jax" not in sys.modules:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache: the kernel graphs (especially the QOA encoder
# scan) are expensive to compile on the 1-core CI host; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/af_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
