# SPDX-License-Identifier: Apache-2.0
"""Dtype identity system for gemlite-tpu.

Single source of truth for dtype identity across the JAX / Pallas / serialization
boundaries. Mirrors the capability matrix of the reference implementation
(/root/reference/gemlite/dtypes.py:8-111) but maps onto jnp/ml_dtypes types.

Dtypes cross the jit/serialization boundary as *ints* (enum values), exactly like
the reference passes them through its custom op.
"""

from enum import Enum

import jax.numpy as jnp


class DType(Enum):
    """Logical dtype ids. Values match the reference enum so serialized metadata
    is interchangeable (reference dtypes.py:8-29)."""

    FP32 = 0
    FP16 = 1
    BF16 = 2
    FP8 = 3
    FP8e4 = 3  # alias for FP8
    INT8 = 4
    UINT8 = 5
    INT32 = 6
    UINT32 = 7
    FP8e5 = 8
    INT16 = 9
    UINT16 = 10
    INT64 = 11
    FP8e4nuz = 12
    FP8e5nuz = 13
    MXFP16 = 14
    MXBF16 = 15
    MXFP8 = 16
    MXFP4 = 17
    NVFP4 = 18
    E8M0 = 19


# enum value -> concrete jnp dtype used for array storage / compute.
# MXFP16/MXBF16 are *compute* views of MX-quantized weights (weights stay packed);
# MXFP4/NVFP4 weights are stored as uint8 fp4-codebook indices.
DTYPE_TO_JAX = {
    0: jnp.float32,
    1: jnp.float16,
    2: jnp.bfloat16,
    3: jnp.float8_e4m3fn,
    4: jnp.int8,
    5: jnp.uint8,
    6: jnp.int32,
    7: jnp.uint32,
    8: jnp.float8_e5m2,
    9: jnp.int16,
    10: jnp.uint16,
    11: jnp.int32,  # int64 is emulated on TPU; we never store int64 (see bitpack)
    12: jnp.float8_e4m3fnuz,
    13: jnp.float8_e5m2fnuz,
    14: jnp.float16,
    15: jnp.bfloat16,
    16: jnp.float8_e4m3fn,
    17: jnp.uint8,
    18: jnp.uint8,
    19: jnp.float8_e8m0fnu,
}

# Reverse map for concrete jnp dtypes -> logical DType (first match wins, so
# aliased entries (MX*) are excluded — identical to reference TORCH_TO_DTYPE).
JAX_TO_DTYPE = {
    jnp.dtype(jnp.float32): DType.FP32,
    jnp.dtype(jnp.float16): DType.FP16,
    jnp.dtype(jnp.bfloat16): DType.BF16,
    jnp.dtype(jnp.int8): DType.INT8,
    jnp.dtype(jnp.uint8): DType.UINT8,
    jnp.dtype(jnp.int32): DType.INT32,
    jnp.dtype(jnp.uint32): DType.UINT32,
    jnp.dtype(jnp.int16): DType.INT16,
    jnp.dtype(jnp.uint16): DType.UINT16,
    jnp.dtype(jnp.float8_e4m3fn): DType.FP8,
    jnp.dtype(jnp.float8_e5m2): DType.FP8e5,
    jnp.dtype(jnp.float8_e4m3fnuz): DType.FP8e4nuz,
    jnp.dtype(jnp.float8_e5m2fnuz): DType.FP8e5nuz,
    jnp.dtype(jnp.float8_e8m0fnu): DType.E8M0,
}


def to_jax_dtype(dtype):
    """DType | int | jnp dtype -> concrete jnp dtype."""
    if isinstance(dtype, DType):
        return DTYPE_TO_JAX[dtype.value]
    if isinstance(dtype, int):
        return DTYPE_TO_JAX[dtype]
    return jnp.dtype(dtype)


def from_jax_dtype(dtype) -> DType:
    return JAX_TO_DTYPE[jnp.dtype(dtype)]


# Storage dtype for packed integer words. The reference uses
# {8: uint8, 16: int16, 32: int32, 64: int64} (reference dtypes.py:95-100).
# TPUs have no native int64 — 64-bit packing is losslessly normalized to 32-bit
# words (identical bit layout; see bitpack.pack_weights_over_cols).
PACKING_BITWIDTH_TO_JAX_DTYPE = {
    8: jnp.uint8,
    16: jnp.int16,
    32: jnp.int32,
}

FP8_DTYPES = [DType.FP8, DType.FP8e4, DType.FP8e5, DType.FP8e4nuz, DType.FP8e5nuz]
FP8_INT8_DTYPES = [DType.INT8] + FP8_DTYPES
MX_DTYPES = [DType.MXFP16, DType.MXBF16, DType.MXFP8, DType.MXFP4, DType.NVFP4]
MX_DTYPES_VAL = [d.value for d in MX_DTYPES]


def is_mx_dtype(input_dtype) -> bool:
    if isinstance(input_dtype, DType):
        return input_dtype in MX_DTYPES
    return input_dtype in MX_DTYPES_VAL


def is_float_dtype(dtype: DType) -> bool:
    return jnp.issubdtype(to_jax_dtype(dtype), jnp.floating)


# ---------------------------------------------------------------------------
# npz-safe serialization of ml_dtypes arrays: np.savez silently degrades
# bfloat16/fp8/e8m0 to raw void records, so these are stored as their bit
# views plus a dtype marker and restored on load.
# ---------------------------------------------------------------------------

import numpy as _np

try:
    import ml_dtypes as _ml_dtypes
except ImportError:  # pragma: no cover - ml_dtypes ships with jax
    _ml_dtypes = None

_NPZ_BIT_VIEWS = {}
if _ml_dtypes is not None:
    for _name, _bits in (("bfloat16", _np.uint16),
                         ("float8_e4m3fn", _np.uint8),
                         ("float8_e5m2", _np.uint8),
                         ("float8_e4m3fnuz", _np.uint8),
                         ("float8_e5m2fnuz", _np.uint8),
                         ("float8_e8m0fnu", _np.uint8)):
        _dt = getattr(_ml_dtypes, _name, None)
        if _dt is not None:
            _NPZ_BIT_VIEWS[_name] = (_dt, _bits)


def npz_encode_array(x):
    """-> (numpy array safe for np.savez, dtype marker or None)."""
    arr = _np.asarray(x)
    entry = _NPZ_BIT_VIEWS.get(str(arr.dtype))
    if entry is not None:
        return arr.view(entry[1]), str(arr.dtype)
    return arr, None


def npz_decode_array(arr, marker):
    """Inverse of npz_encode_array (numpy out; callers jnp.asarray as
    needed — the ml dtype is restored by the bit view)."""
    if marker:
        entry = _NPZ_BIT_VIEWS.get(marker)
        if entry is None:
            raise ValueError(f"unknown checkpoint dtype marker {marker!r}")
        return _np.asarray(arr).view(entry[0])
    return _np.asarray(arr)
