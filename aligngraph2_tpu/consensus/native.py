"""ctypes bridge to the native consensus core (native/poacns.cpp).

The C++ library implements the full pa_cns per-backbone flow (window
slicing, dagcon gap normalization, top-K, POA graph consensus) with
std::thread window parallelism, bit-identically to the pure-Python
modules in this package (which remain the specification, the fallback,
and the parity oracle in tests/test_native_poa.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

from ..utils.nativebuild import ensure_lib

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "poacns.cpp")
# ALIGNGRAPH2_TPU_NATIVE_DIR points the loader at alternate builds
# (e.g. the sanitizer-instrumented .so files of tests/test_sanitizers.py)
_SO = os.path.join(os.environ.get("ALIGNGRAPH2_TPU_NATIVE_DIR")
                   or _NATIVE_DIR, "libpoacns.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


_FLAGS = ["-O2", "-std=c++17", "-shared", "-fPIC", "-pthread"]


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ALIGNGRAPH2_TPU_NATIVE_DIR"):
            # explicit override (e.g. sanitizer-instrumented builds):
            # trust the provided .so as-is
            if not os.path.exists(_SO):
                return None
        elif not ensure_lib(_SRC, _SO, _FLAGS):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.agp_consensus_backbone.restype = ctypes.c_int
        lib.agp_consensus_backbone.argtypes = [
            ctypes.c_char_p, i64,                       # backbone, blen
            i64,                                        # n_alns
            ctypes.POINTER(i64), ctypes.POINTER(i64),   # rb, re
            ctypes.POINTER(i64),                        # score
            ctypes.POINTER(ctypes.c_char_p),            # qstrs
            ctypes.POINTER(ctypes.c_char_p),            # tstrs
            i64, i64, i64, i64, i64,                    # window..threads
            ctypes.POINTER(ctypes.c_char_p),            # out
            ctypes.POINTER(i64),                        # out_len
        ]
        lib.agp_free.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def consensus_backbone_native(backbone: str, alns, window: int, top_k: int,
                              alpha: int, min_weight: int,
                              threads: int) -> Optional[str]:
    """Native pa_cns for one backbone, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(alns)
    i64 = ctypes.c_int64
    rb = (i64 * n)(*(a.rb for a in alns))
    re_ = (i64 * n)(*(a.re for a in alns))
    sc = (i64 * n)(*(a.score for a in alns))
    qstrs = (ctypes.c_char_p * n)(*(a.qstr.encode() for a in alns))
    tstrs = (ctypes.c_char_p * n)(*(a.tstr.encode() for a in alns))
    out = ctypes.c_char_p()
    out_len = i64()
    rc = lib.agp_consensus_backbone(
        backbone.encode(), len(backbone), n, rb, re_, sc, qstrs, tstrs,
        window, top_k, alpha, min_weight, max(threads, 1),
        ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0 or out.value is None:
        return "" if rc == 0 else None
    try:
        return out.value[:out_len.value].decode("ascii")
    finally:
        lib.agp_free(out)
