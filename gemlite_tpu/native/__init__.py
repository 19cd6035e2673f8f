# SPDX-License-Identifier: Apache-2.0
"""ctypes loader for the native C++ packing engine (packer.cpp).

Compiled on demand with g++ into this directory (cached); every entry point
degrades gracefully to the jnp implementation in bitpack.py when the
toolchain or library is unavailable, so the package never hard-depends on a
compiler at runtime.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packer.cpp")
_LIB = os.path.join(_DIR, "_packer.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no compiler / sandboxed FS / etc.
        logger.debug("native packer build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.debug("native packer load failed: %s", e)
            return None
        lib.gemlite_pack_over_cols.restype = ctypes.c_int
        lib.gemlite_pack_over_cols.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        lib.gemlite_unpack_over_cols.restype = ctypes.c_int
        lib.gemlite_unpack_over_cols.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_WORD_DTYPE = {8: np.uint8, 16: np.uint16, 32: np.uint32}
# output dtype parity with bitpack.PACKING_BITWIDTH_TO_JAX_DTYPE
_OUT_DTYPE = {8: np.uint8, 16: np.int16, 32: np.int32}


def pack_over_cols_np(W: np.ndarray, W_nbits: int, bitwidth: int,
                      n_threads: int = 0):
    """(N, K) uint8 codes -> (K/elems, N) words (kernel layout, same dtypes as
    the jnp packer), or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if bitwidth == 64:
        bitwidth = 32  # identical byte layout; TPUs have no int64 (bitpack.py)
    W = np.ascontiguousarray(W, dtype=np.uint8)
    N, K = W.shape
    elems = bitwidth // W_nbits
    if K % elems:
        return None
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    out = np.empty((K // elems, N), dtype=_WORD_DTYPE[bitwidth])
    rc = lib.gemlite_pack_over_cols(
        W.ctypes.data, N, K, W_nbits, bitwidth, out.ctypes.data, n_threads)
    if rc != 0:
        return None
    return out.view(_OUT_DTYPE[bitwidth])


def unpack_over_cols_np(packed: np.ndarray, W_nbits: int, K: int,
                        n_threads: int = 0):
    """(K/elems, N) words -> (N, K) uint8 codes, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed)
    bitwidth = packed.dtype.itemsize * 8
    rows, N = packed.shape
    if rows * (bitwidth // W_nbits) != K:
        return None
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    out = np.empty((N, K), dtype=np.uint8)
    rc = lib.gemlite_unpack_over_cols(
        packed.ctypes.data, N, K, W_nbits, bitwidth, out.ctypes.data,
        n_threads)
    if rc != 0:
        return None
    return out
