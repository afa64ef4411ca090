"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no pytest suite (only manual GPU/network smoke scripts,
/root/reference/test_setup.py etc.); this suite is hermetic — tiny
random-weight configs, synthetic audio, no network — and exercises the
multi-chip sharding path on virtual CPU devices.
"""

import os

# Must be set before the JAX backend initializes.
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin; tests run on CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
