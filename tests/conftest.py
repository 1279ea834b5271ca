"""Test configuration.

Correctness CI runs on the CPU backend (same XLA semantics, no TPU needed) —
SURVEY.md §4.  NOTE: on hosts with the axon TPU plugin, JAX_PLATFORMS=cpu is
overridden by the plugin, so we instead pin `jax_default_device` to a CPU
device and raise `jax_num_cpu_devices` to 8 for multi-chip sharding tests.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # honored when no TPU plugin

import jax

# Persistent compilation cache: kernel graphs (especially the QOA encoder
# scan) are expensive to compile on the 1-core CI host; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/af_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def cpu_mesh_devices():
    return jax.devices("cpu")
