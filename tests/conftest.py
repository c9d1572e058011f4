"""Test configuration: force an 8-fake-device CPU backend BEFORE jax loads.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU behavior is
exercised by bench.py and the driver's compile checks instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never touch the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize registers the TPU ("axon") backend and pins
# jax_platforms at import time — override it here so tests run on the
# 8-fake-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
