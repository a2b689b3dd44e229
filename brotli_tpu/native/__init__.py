"""Native (C++) runtime components, built on first use and loaded via ctypes.

The TPU owns the compute path (JAX/Pallas); these cover the parts of the
runtime that are memory- or IO-bound on the host: LZ token resolution
(phase 2 of device decode) and, later, stream splicing and data loading.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_LIB: ctypes.CDLL | None = None


def _build() -> Path:
    src = _DIR / "lz_resolve.cpp"
    out = _DIR / "libbrotli_tpu_native.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(out), str(src), "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build()))
        for name in ("lz_resolve_batch", "lz_resolve_batch_v2"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
        _LIB = lib
    return _LIB


def lz_resolve_batch(tokens, expected_lens, n_threads: int = 8):
    """Resolve (n_rows, n_lanes) u32 tokens -> (n_lanes, cap) u8 outputs.

    `expected_lens[lane]` is the decoded size (known from the metablock
    header); resolution stops there. Returns (out, lens) where
    lens[lane] == -1 marks a malformed lane.
    """
    import numpy as np

    tokens = np.ascontiguousarray(tokens, dtype=np.uint32)
    n_rows, n_lanes = tokens.shape
    lens = np.asarray(expected_lens, dtype=np.int64).copy()
    assert lens.shape == (n_lanes,)
    cap = max(1, int(lens.max()))
    out = np.zeros((n_lanes, cap), dtype=np.uint8)
    lib = get_lib()
    lib.lz_resolve_batch(
        tokens.ctypes.data_as(ctypes.c_void_p),
        n_rows, n_lanes,
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
        lens.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return out, lens


def lz_resolve_batch_v2(tokens, expected_lens, n_threads: int = 8):
    """v2-token variant of lz_resolve_batch (see ops/pallas_decode2.py)."""
    import numpy as np

    tokens = np.ascontiguousarray(tokens, dtype=np.uint32)
    n_rows, n_lanes = tokens.shape
    lens = np.asarray(expected_lens, dtype=np.int64).copy()
    assert lens.shape == (n_lanes,)
    cap = max(1, int(lens.max()))
    out = np.zeros((n_lanes, cap), dtype=np.uint8)
    lib = get_lib()
    lib.lz_resolve_batch_v2(
        tokens.ctypes.data_as(ctypes.c_void_p),
        n_rows, n_lanes,
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
        lens.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return out, lens
