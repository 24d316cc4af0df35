"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md section 4).

Note: this image's sitecustomize registers an `axon` TPU PJRT plugin and
force-sets jax_platforms to "axon,cpu"; we must override via
jax.config.update (env vars are ignored) BEFORE any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled XLA CPU executables between test modules.

    A full-suite run accumulates hundreds of live CPU executables; at
    ~the 73rd test the NEXT backend_compile segfaults inside XLA:CPU
    (reproduced twice at the same spot, never in isolation or in short
    runs). Dropping caches per module keeps the live-executable set
    bounded; within-module compile reuse - where almost all sharing
    happens - is unaffected."""
    yield
    jax.clear_caches()
