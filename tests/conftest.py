"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-device tests (data-parallel training, sharded inference) run on the
host platform with 8 virtual devices, mirroring how the driver validates
the multi-chip path (SURVEY.md §4: multi-device tests runnable on CPU via
--xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
