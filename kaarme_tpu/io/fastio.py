"""ctypes binding for the native encoder, with transparent NumPy fallback.

The native piece of the host input runtime — the counterpart of the
reference's C++ byte-level parsing loops (reference:
include/parallel_parser.hpp hash_kmers character handling,
source/functions_strings.cpp:56-70 char2int).  Compiles ``_fastio.cpp``
with g++ on first use (cached next to the source); if the toolchain is
unavailable the pure-NumPy encoders in ``utils.codec`` are used
instead — same semantics, tested for equality.
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
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.kt_pack_codes.argtypes = [u8p, ctypes.c_size_t, u32p, u32p]
    lib.kt_pack_codes.restype = None
    lib.kt_encode_fastq.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.kt_encode_fastq.restype = ctypes.c_size_t
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


_PACK_POOL = None


def _pool():
    global _PACK_POOL
    if _PACK_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _PACK_POOL = ThreadPoolExecutor(max_workers=os.cpu_count() or 4)
    return _PACK_POOL


def encode_fastq(buf, state=None):
    """FASTQ chunk -> codes; ``state`` carries the parser across chunks."""
    from ..utils import codec

    if state is None:
        state = codec.FASTQ_STATE0
    lib = get_lib()
    if lib is None:
        return codec.encode_fastq(buf, state)
    a = np.frombuffer(buf, np.uint8) if not isinstance(buf, np.ndarray) else buf
    out = np.empty(a.shape[0] + 1, np.uint8)
    st = ctypes.c_int(state[0])
    sl = ctypes.c_longlong(state[1])
    ql = ctypes.c_longlong(state[2])
    n = 0
    if a.shape[0]:
        n = lib.kt_encode_fastq(
            _u8ptr(np.ascontiguousarray(a)), a.shape[0], _u8ptr(out),
            ctypes.byref(st), ctypes.byref(sl), ctypes.byref(ql),
        )
    return out[:n], (st.value, sl.value, ql.value)


def pack_stream(codes: np.ndarray):
    """2-bit pack + invalid bitmap for device transfer (3.2x fewer bytes
    than raw codes).  Native C++ path, multithreaded over 32-code-aligned
    slices (ctypes releases the GIL); NumPy fallback matches
    ops/sortcount.pack_stream_np exactly."""
    lib = get_lib()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    if lib is None:
        from ..ops.sortcount import pack_stream_np

        return pack_stream_np(codes)
    n = codes.shape[0]
    packed = np.empty((n + 15) // 16, np.uint32)
    mask = np.empty((n + 31) // 32, np.uint32)
    if not n:
        return packed, mask
    u32p = ctypes.POINTER(ctypes.c_uint32)
    p_in = _u8ptr(codes)
    p_pk = packed.ctypes.data_as(u32p)
    p_mk = mask.ctypes.data_as(u32p)

    nt = min(os.cpu_count() or 1, max(1, n // (1 << 21)))
    if nt <= 1:
        lib.kt_pack_codes(p_in, n, p_pk, p_mk)
        return packed, mask

    # slice boundaries aligned to 32 codes: each slice owns disjoint
    # packed words (i/16) and mask words (i/32)
    step = ((n // nt) // 32) * 32

    def work(t):
        lo = t * step
        hi = n if t == nt - 1 else (t + 1) * step
        lib.kt_pack_codes(
            ctypes.cast(ctypes.addressof(p_in.contents) + lo, u8ptr_t),
            hi - lo,
            ctypes.cast(ctypes.addressof(p_pk.contents) + (lo // 16) * 4, u32p),
            ctypes.cast(ctypes.addressof(p_mk.contents) + (lo // 32) * 4, u32p),
        )

    u8ptr_t = ctypes.POINTER(ctypes.c_uint8)
    list(_pool().map(work, range(nt)))
    return packed, mask
