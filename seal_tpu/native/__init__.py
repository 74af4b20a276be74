"""Native (C++) runtime components, built on demand and bound via ctypes.

The compute path is jax/XLA/Pallas; the host-side runtime hot spots — the
blake2xb PRNG stream feeding the samplers — run natively here (the pure
Python implementations in seal_tpu.utils.blake2 / seal_tpu.randomgen remain
as fallback and cross-check).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_here = pathlib.Path(__file__).parent
_src = _here / "blake2_native.cpp"
_so = _here / "libsealtpu_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_src), "-o", str(_so)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _so.exists() or _so.stat().st_mtime < _src.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_so))
        except OSError:
            return None
        lib.sealtpu_blake2xb_stream.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        lib.sealtpu_blake2xb_stream.restype = None
        _lib = lib
        return _lib


def blake2xb_stream(seed, counter: int, n_bytes: int) -> bytes | None:
    """n_bytes (multiple of 4096) of the blake2xb PRNG stream, or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert n_bytes % 4096 == 0
    seed_arr = (ctypes.c_uint64 * 8)(*[s & 0xFFFFFFFFFFFFFFFF for s in seed])
    out = (ctypes.c_uint8 * n_bytes)()
    lib.sealtpu_blake2xb_stream(seed_arr, counter, out, n_bytes)
    return bytes(out)
