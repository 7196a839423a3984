"""Native (C++) host runtime loader.

Builds gkrhost.cpp on demand (g++ -O3 -fopenmp, cached next to the source)
and exposes it via ctypes.  Everything degrades gracefully: if no compiler
or load failure, `lib()` returns None and callers fall back to the pure
Python host engine."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gkrhost.cpp")
_SO = os.path.join(_HERE, "libgkrhost.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def lib():
    """Load (building if needed) the native library, or None.
    GKR_NO_NATIVE=1 disables it (fallback paths / fault isolation)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GKR_NO_NATIVE", "") == "1":
            return None
        so = build()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        sz = ctypes.c_size_t
        L.gkr_version.restype = ctypes.c_int
        L.gkr_num_threads.restype = ctypes.c_int
        L.gkr_batch_mul.argtypes = [u8p, u8p, u8p, sz]
        L.gkr_batch_add.argtypes = [u8p, u8p, u8p, sz]
        L.gkr_mimc_init.argtypes = [u8p]
        L.gkr_mimc_multi_hash.argtypes = [u8p, sz, u8p]
        L.gkr_to_mont.argtypes = [u8p, sz]
        L.gkr_from_mont.argtypes = [u8p, sz]
        L.gkr_eq_table.argtypes = [u8p, sz, u8p]
        L.gkr_scatter_phase1.argtypes = [u8p, u8p, i32p, sz, u8p, u8p]
        L.gkr_scatter_phase2.argtypes = [u8p, u8p, u8p, i32p, sz, u8p]
        L.gkr_phase1_eval.argtypes = [u8p, u8p, u8p, u8p, sz, u8p]
        L.gkr_phase2_eval.argtypes = [u8p, u8p, u8p, u8p, sz, u8p]
        L.gkr_fold.argtypes = [u8p, sz, u8p]
        L.gkr_mobius.argtypes = [u8p, sz]
        if L.gkr_version() != 1:
            return None
        # install MiMC round constants
        from ..mimc import mimc7_constants
        cts = b"".join(c.to_bytes(32, "little") for c in mimc7_constants())
        buf = (ctypes.c_uint8 * len(cts)).from_buffer_copy(cts)
        L.gkr_mimc_init(ctypes.cast(buf, u8p))
        _lib = L
        return _lib


def available() -> bool:
    return lib() is not None
