"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All unit tests run on XLA-CPU (fast, deterministic, no TPU needed); sharding
tests use the 8 virtual host devices — the standard JAX substitute for a
multi-chip slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (TPU tunnel)
# regardless of the env var — override it back to pure CPU for unit tests.
jax.config.update("jax_platforms", "cpu")

# Reduced-precision matmuls (bf16 MXU passes / oneDNN) would break parity
# comparisons — force exact f32.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: most suite wall-time is XLA-CPU compiles of
# tiny-model programs that rarely change — caching them cuts repeat runs
# far below the cold time (keyed by optimized-HLO hash, safe across edits).
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
