"""ctypes bindings for the native runtime helpers (sdtpu_native.cpp).

Builds lazily with g++ on first use; every entry point has a pure-numpy
fallback, and the Philox path additionally self-verifies bit-exactness
against the numpy reference at load time (falls back if libm ever
disagrees)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sdtpu_native.cpp")
_LIB = os.path.join(_HERE, "libsdtpu_native.so")

_lib = None
_lock = threading.RLock()  # reentrant: the load-time self-verify calls back in
_philox_verified = False
_DEFAULT_THREADS = min(os.cpu_count() or 4, 16)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _philox_verified
    with _lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib = False
            return None
        u64, u32, i32 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_int
        pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        pu16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        lib.philox_randn.argtypes = [u64, u32, u32, u64, pf, i32]
        lib.convert_f16_to_f32.argtypes = [pu16, pf, u64, i32]
        lib.convert_f16_to_bf16.argtypes = [pu16, pu16, u64, i32]
        lib.convert_f32_to_bf16.argtypes = [pf, pu16, u64, i32]
        lib.convert_bf16_to_f32.argtypes = [pu16, pf, u64, i32]
        _lib = lib

        # self-verify philox bit-exactness vs the numpy reference
        from sdwebui_tpu.rng.philox import randn_at

        got = philox_randn(12345, 3, 2, 257, force_native=True)
        ref = randn_at(12345, np.array([3, 4]), 257).astype(np.float32)
        _philox_verified = bool(np.array_equal(got, ref))
        return _lib


def available() -> bool:
    return get_lib() is not None


def philox_randn(seed: int, offset_start: int, n_offsets: int, n: int,
                 threads: int | None = None, force_native: bool = False):
    """(n_offsets, n) float32 gaussians; bit-exact with rng.philox.randn_at."""
    lib = get_lib()
    if lib is not None and (force_native or _philox_verified):
        out = np.empty((n_offsets, n), np.float32)
        lib.philox_randn(seed & 0xFFFFFFFFFFFFFFFF, offset_start, n_offsets,
                         n, out, threads or _DEFAULT_THREADS)
        return out
    from sdwebui_tpu.rng.philox import randn_at

    return randn_at(seed, offset_start + np.arange(n_offsets), n).astype(np.float32)


def convert(arr: np.ndarray, target: str, threads: int | None = None) -> np.ndarray:
    """Multithreaded dtype conversion for checkpoint loads.

    target: 'float32' | 'bfloat16'. Falls back to numpy astype."""
    import ml_dtypes

    lib = get_lib()
    threads = threads or _DEFAULT_THREADS
    src_kind = str(arr.dtype)
    n = arr.size
    flat = np.ascontiguousarray(arr).reshape(-1)

    if lib is not None:
        if src_kind == "float16" and target == "float32":
            out = np.empty(n, np.float32)
            lib.convert_f16_to_f32(flat.view(np.uint16), out, n, threads)
            return out.reshape(arr.shape)
        if src_kind == "float16" and target == "bfloat16":
            out = np.empty(n, np.uint16)
            lib.convert_f16_to_bf16(flat.view(np.uint16), out, n, threads)
            return out.view(ml_dtypes.bfloat16).reshape(arr.shape)
        if src_kind == "float32" and target == "bfloat16":
            out = np.empty(n, np.uint16)
            lib.convert_f32_to_bf16(flat, out, n, threads)
            return out.view(ml_dtypes.bfloat16).reshape(arr.shape)
        if src_kind == "bfloat16" and target == "float32":
            out = np.empty(n, np.float32)
            lib.convert_bf16_to_f32(flat.view(np.uint16), out, n, threads)
            return out.reshape(arr.shape)

    dt = np.dtype(ml_dtypes.bfloat16) if target == "bfloat16" else np.dtype(target)
    return arr.astype(dt)
