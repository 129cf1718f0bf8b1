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


def pallas_default() -> bool:
    """Whether Pallas kernels should be the DEFAULT compute path.

    True on the TPU backend, where the measured winners run compiled
    (BENCH_r03 on v5e: fused conv+maxpool 2.37 ms vs 3.08 ms XLA chain;
    fbank 1.52 ms vs 2.15 ms) — mirroring the reference, where the fork
    CUDA kernels are unconditionally the scoring path when a GPU exists
    (ref: cu-device.cc SelectGpuId + SURVEY.md §2.1 fork row).  False
    elsewhere: interpret mode is the correctness oracle, not a fast
    path."""
    return jax.default_backend() == "tpu"


def resolve_pallas(flag) -> bool:
    """None -> backend default; explicit bool wins."""
    return pallas_default() if flag is None else bool(flag)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
