"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX substitute for a
multi-chip TPU slice, cf. SURVEY.md §4): the env vars must be set before jax
is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This image's jax build force-selects the 'axon' TPU platform regardless of
# JAX_PLATFORMS; pin the CPU backend explicitly so tests run on the virtual
# 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
# NOTE: no persistent compilation cache — this image's XLA:CPU AOT loader
# flags host-feature mismatches on reloaded cache entries (SIGILL risk).

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
