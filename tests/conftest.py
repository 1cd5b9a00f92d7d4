"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of fake-backend testing (SURVEY.md §4): sharding
and collective code paths compile and execute on N host devices without
hardware. Must run before jax initializes, hence the env mutation at import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
