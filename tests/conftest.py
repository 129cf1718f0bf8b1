"""Test harness: run everything on the CPU backend with a virtual
8-device mesh (SURVEY.md §4 'distributed testing without a cluster').

Pallas kernels run in interpreter mode on CPU (ops.common.use_interpret),
mirroring the reference's CuDevice CPU fallback that lets its whole test
suite run GPU-less (ref: src/cudamatrix/cu-device.cc).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The env var JAX_PLATFORMS is not honored under the axon TPU plugin in
# this image; the config update is, and must precede backend init.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
