"""Shared kernel utilities.

The reference's CuDevice transparently falls back to CPU when no GPU is
present (ref: src/cudamatrix/cu-device.cc SelectGpuId); our equivalent is
running Pallas kernels in interpreter mode on non-TPU backends, so the
whole test suite runs on the CPU backend (conftest pins JAX_PLATFORMS=cpu
with a virtual 8-device mesh) while production runs compiled on TPU.
"""

from __future__ import annotations

import jax


def use_interpret() -> bool:
    """True when Pallas TPU kernels must run interpreted (non-TPU backend)."""
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
