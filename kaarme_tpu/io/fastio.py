"""ctypes binding for the native encoder, with transparent NumPy fallback.

Compiles ``_fastio.cpp`` with g++ on first use (cached next to the
source); if the toolchain is unavailable the pure-NumPy encoders in
``utils.codec`` are used instead — same semantics, tested for equality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils import codec

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fastio.cpp")
    so = os.path.join(os.path.dirname(src), "_fastio.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.kt_encode_plain.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.kt_encode_plain.restype = None
    lib.kt_encode_fasta.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.POINTER(ctypes.c_int)]
    lib.kt_encode_fasta.restype = ctypes.c_size_t
    return lib


def get_lib():
    """The native library, or None if it cannot be built."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
            _TRIED = True
    return _LIB


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_plain(buf) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return codec.encode_plain(buf)
    a = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    out = np.empty(a.shape[0], np.uint8)
    if a.shape[0]:
        lib.kt_encode_plain(_u8ptr(np.ascontiguousarray(a)), a.shape[0], _u8ptr(out))
    return out


def encode_fasta(buf, prev_in_header: bool = False):
    lib = get_lib()
    if lib is None:
        return codec.encode_fasta(buf, prev_in_header)
    a = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    out = np.empty(a.shape[0], np.uint8)
    state = ctypes.c_int(1 if prev_in_header else 0)
    n = 0
    if a.shape[0]:
        n = lib.kt_encode_fasta(
            _u8ptr(np.ascontiguousarray(a)), a.shape[0], _u8ptr(out), ctypes.byref(state)
        )
    return out[:n], bool(state.value)
