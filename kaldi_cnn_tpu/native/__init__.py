"""Native (C++) runtime components with ctypes bindings.

The reference's runtime outside the GPU math is C++ (decoders, Table
I/O, schedulers); here the host-side hot loops get the same treatment:
C++ sources in this package are compiled on first use into a cached
shared library (g++ -O3) and bound via ctypes — no pip/pybind needed —
with transparent numpy fallbacks when no toolchain is available.

Current components:
  viterbi.cc  — host token-passing core (ref: faster-decoder.cc),
                used by decode.decoder for alignment/decoding.
  tableio.cc  — ark archive scanner (ref: util/kaldi-table-inl.h
                readers), used by io.native_io for mmap-backed
                sequential/random-access Table readers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def load() -> Optional[ctypes.CDLL]:
    """Compile-on-demand + cache.  Returns None when disabled or the
    toolchain is missing (callers fall back to numpy)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("KALDI_CNN_TPU_NATIVE", "1") == "0":
        return None
    here = os.path.dirname(__file__)
    srcs = [os.path.join(here, f) for f in sorted(os.listdir(here))
            if f.endswith(".cc")]
    out = os.path.join(_build_dir(), "libkctnative.so")
    try:
        if (not os.path.exists(out)
                or any(os.path.getmtime(out) < os.path.getmtime(s)
                       for s in srcs)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   "-o", out] + srcs
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        lib = ctypes.CDLL(out)
    except (OSError, subprocess.SubprocessError, FileNotFoundError):
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer
    i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.kct_viterbi.restype = ctypes.c_int64
    lib.kct_viterbi.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, i32, i32, i32, i32, f32, i32,
        ctypes.c_int64, i32, i32, i32, f32,
        f32,
        f32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float,
        i32, i32, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
    ]
    u8 = ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.kct_ark_index.restype = ctypes.c_int64
    lib.kct_ark_index.argtypes = [
        u8, ctypes.c_int64, ctypes.c_int64,
        i64, i32, i64, i32, i32, i32,
    ]
    lib.kct_ark_read_ivec.restype = ctypes.c_int32
    lib.kct_ark_read_ivec.argtypes = [u8, ctypes.c_int32, i32]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None
