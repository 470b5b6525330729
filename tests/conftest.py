"""Test configuration: run everything on CPU with 8 virtual devices.

Mesh/collective logic is validated on a simulated 8-device CPU platform
(the SURVEY.md §4 test strategy, config 5) so tests never require real
multi-chip hardware. Pallas kernels run in interpret mode on CPU.

Note: the environment may pin JAX_PLATFORMS to a TPU plugin; the config
update below takes precedence, so tests always run on host CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# Numerics tests compare against float references — keep fp32 matmuls fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# This box has a single CPU core and XLA compiles are slow; cache compiled
# programs on disk so repeated test runs don't recompile every tiny op.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
