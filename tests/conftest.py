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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
