"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of fake-backend testing (SURVEY.md §4): sharding
and collective code paths compile and execute on N host devices without
hardware.

Note: this environment's axon TPU plugin registers itself in sitecustomize at
interpreter startup and pins JAX_PLATFORMS before any test code runs, so env
mutation alone does NOT switch to CPU — jax.config.update('jax_platforms')
after import is required (see .claude/skills/verify/SKILL.md).
"""

import os

# honored if the backend isn't initialized yet (belt and suspenders)
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs (and the driver's) skip
# recompiles of unchanged jits — the suite is compile-dominated
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: env vars above cover it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + str(jax.devices()[0]))
    assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {len(jax.devices())}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
