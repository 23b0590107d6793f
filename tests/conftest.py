"""Test harness: run everything on an 8-device virtual CPU mesh.

This is how multi-chip sharding is validated without a TPU pod (SURVEY §4):
``xla_force_host_platform_device_count`` gives 8 CPU devices, so the SPMD
train step compiles and runs with real collectives.
"""

import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
if _REPO not in sys.path:  # so the suite also works when not run from repo root
    sys.path.insert(0, _REPO)

from contrad_tpu.hostenv import force_host_device_count  # noqa: E402 (jax-free)

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the real TPU: fast, f32-exact
force_host_device_count(8)
# Persistent XLA compilation cache: the suite's cost is dominated by
# recompiling identical 8-device train-step programs (test_step.py alone was
# ~9 min cold).  The cache dedups identical programs across tests AND across
# suite runs; set via env var so subprocess CLI tests (test_cli.py,
# test_quality_run.py) inherit it.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir,
                                 ".jax_cache")))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (import after env setup)

# The hosted "axon" TPU plugin can take precedence over the env var; force it.
jax.config.update("jax_platforms", "cpu")
# The cache env vars above only bind when present at interpreter exec (they
# cover the subprocess CLI tests); for THIS process set the config directly.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
