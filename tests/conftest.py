"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-device tests (data-parallel training, sharded inference) run on the
host platform with 8 virtual devices, mirroring how the driver validates
the multi-chip path (SURVEY.md §4: multi-device tests runnable on CPU via
--xla_force_host_platform_device_count).
"""
import os

# Force, don't setdefault: the environment presets JAX_PLATFORMS=axon (the
# TPU tunnel) and a sitecustomize hook re-applies it even over an env
# override — so we must also set the config knob after importing jax.
# Tests are correctness tests and must run on the virtual CPU mesh.
# Override with RIFE_TPU_TEST_PLATFORM=tpu to opt out.
_platform = os.environ.get("RIFE_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
