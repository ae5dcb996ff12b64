"""ctypes bindings to the native host-ops library (csrc/host_ops.cpp).

The reference keeps all host-side hot loops (bit packing, BER accounting) in
C++ (src/main.cpp:151-171, src/viterbiDF.h).  This module provides the same
native-speed path for the TPU framework: the shared library is built once on
demand with g++ -O3 and cached next to the source; every entry point has a
NumPy fallback (see utils/bits.py) so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_csrc_dir(), "host_ops.cpp")
    out = os.path.join(_csrc_dir(), "libviterbi_host.so")
    if not os.path.exists(src):
        return None
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.count_bit_errors_u32.restype = ctypes.c_longlong
    lib.count_bit_errors_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
    lib.count_bit_errors_u16.restype = ctypes.c_longlong
    lib.count_bit_errors_u16.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def native_count_bit_errors(decoded_words: np.ndarray, bits_per_pack: int,
                            ref_bits: np.ndarray) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    ref = np.ascontiguousarray(ref_bits, dtype=np.uint8)
    if bits_per_pack == 32:
        w = np.ascontiguousarray(decoded_words, dtype=np.uint32)
        fn, ptr_t = lib.count_bit_errors_u32, ctypes.c_uint32
    elif bits_per_pack == 16:
        w = np.ascontiguousarray(decoded_words, dtype=np.uint16)
        fn, ptr_t = lib.count_bit_errors_u16, ctypes.c_uint16
    else:
        return None
    return int(fn(w.ctypes.data_as(ctypes.POINTER(ptr_t)), len(w),
                  ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  len(ref)))
