# SPDX-License-Identifier: Apache-2.0
"""Bit-packing engine.

Packs uint8 quantized weights (values in [0, 2**W_nbits)) into {8,16,32}-bit
integer words, least-significant-element-first: within a word, element ``j``
lives at bits ``[j*W_nbits, (j+1)*W_nbits)``. This is bit-compatible with the
reference packer (/root/reference/gemlite/bitpack.py:36-60): a weight matrix
packed here dequantizes to identical values.

TPU note: these are pure-jnp vectorized ops (shift/or over reshaped planes) —
XLA compiles them to a handful of fused VPU ops, fast enough for pack-time and
usable on CPU for host-side checkpoint conversion. In-kernel unpacking (the hot
path) lives in ops/ as Pallas device code using the same bit layout.

64-bit packing requests are losslessly normalized to 32-bit words: a 64-bit
little-endian word whose element ``j`` sits at bit ``j*W_nbits`` has the exact
same byte layout as two consecutive 32-bit words packed the same way (for any
W_nbits dividing 32). TPUs have no native int64, so we return the int32 form
with ``elements_per_sample = 32 // W_nbits``.
"""

import functools

import jax.numpy as jnp
import numpy as np

from .dtypes import PACKING_BITWIDTH_TO_JAX_DTYPE

__all__ = [
    "pack_weights_over_cols",
    "pack_weights_over_rows",
    "unpack_over_cols",
    "unpack_over_rows",
    "fold_codes_for_planes",
    "fold_plane_count",
    "unfold_codes_for_planes",
]


def _normalize_bitwidth(W_nbits: int, packing_bitwidth: int):
    assert packing_bitwidth in (8, 16, 32, 64), "Unsupported bitpacking width"
    assert W_nbits in (8, 4, 2, 1), "Unsupported nbits"
    if packing_bitwidth == 64:  # no native int64 on TPU; identical bit layout
        packing_bitwidth = 32
    elements_per_sample = packing_bitwidth // W_nbits
    return packing_bitwidth, elements_per_sample


def pack_weights_over_cols(W_q, W_nbits: int, packing_bitwidth: int = 32, transpose: bool = True):
    """Pack along the last axis (over K of an (N, K) matrix).

    Returns ``(packed, elements_per_sample)``; with ``transpose=True`` the packed
    matrix has shape ``(K // elements_per_sample, N)`` — the kernel-facing layout
    (K on sublanes, N on lanes). Mirrors reference bitpack.py:36-60.
    """
    packing_bitwidth, elems = _normalize_bitwidth(W_nbits, packing_bitwidth)
    rows, cols = W_q.shape
    assert cols % elems == 0, f"cols ({cols}) must be divisible by elements_per_sample ({elems})"

    # host-side numpy input: use the multithreaded C++ packer when available
    # (checkpoint-load fast path; bit-identical layout)
    if transpose and isinstance(W_q, np.ndarray) and W_q.dtype == np.uint8:
        from . import native
        packed_np = native.pack_over_cols_np(W_q, W_nbits, packing_bitwidth)
        if packed_np is not None:
            return jnp.asarray(packed_np), elems

    v = jnp.asarray(W_q).astype(jnp.int32).reshape(rows, cols // elems, elems)
    planes = [v[:, :, j] << (j * W_nbits) for j in range(elems)]
    packed = functools.reduce(jnp.bitwise_or, planes)
    packed = packed.astype(PACKING_BITWIDTH_TO_JAX_DTYPE[packing_bitwidth])
    if transpose:
        packed = packed.T
    return packed, elems


def pack_weights_over_rows(W_q, W_nbits: int, packing_bitwidth: int = 32, transpose: bool = False):
    """Pack along the first axis. Mirrors reference bitpack.py:10-34."""
    packing_bitwidth, elems = _normalize_bitwidth(W_nbits, packing_bitwidth)
    rows, cols = W_q.shape
    assert rows % elems == 0, f"rows ({rows}) must be divisible by elements_per_sample ({elems})"

    v = jnp.asarray(W_q).astype(jnp.int32).reshape(rows // elems, elems, cols)
    planes = [v[:, j, :] << (j * W_nbits) for j in range(elems)]
    packed = functools.reduce(jnp.bitwise_or, planes)
    packed = packed.astype(PACKING_BITWIDTH_TO_JAX_DTYPE[packing_bitwidth])
    if transpose:
        packed = packed.T
    return packed, elems


def unpack_over_cols(W_q_packed, W_nbits: int, num_output_cols: int, dtype=jnp.uint8):
    """Inverse of pack_weights_over_cols (pre-transpose orientation).

    ``W_q_packed`` is (R, Cp); returns (R, num_output_cols)."""
    rows, cols_p = W_q_packed.shape
    elems = num_output_cols // cols_p
    mask = (1 << W_nbits) - 1
    shifts = (jnp.arange(elems, dtype=jnp.int32) * W_nbits)[None, None, :]
    v = jnp.asarray(W_q_packed).astype(jnp.int32)[:, :, None]
    out = ((v >> shifts) & mask).astype(dtype).reshape(rows, num_output_cols)
    return out


def unpack_over_rows(W_q_packed, W_nbits: int, num_output_rows: int, dtype=jnp.uint8):
    """Inverse of pack_weights_over_rows. ``W_q_packed`` is (Rp, C)."""
    rows_p, cols = W_q_packed.shape
    elems = num_output_rows // rows_p
    mask = (1 << W_nbits) - 1
    shifts = (jnp.arange(elems, dtype=jnp.int32) * W_nbits)[None, :, None]
    v = jnp.asarray(W_q_packed).astype(jnp.int32)[:, None, :]
    out = ((v >> shifts) & mask).astype(dtype).reshape(num_output_rows, cols)
    return out


# --- pack-time plane folding (w_layout=1) -----------------------------------
#
# The Pallas plane kernels (ops/pallas_decode.py) extract halfword plane j of
# each int32 word via ``(w >> j*W_nbits) & mask`` and stack the P = 16/W_nbits
# planes per fold unit, which imposes the within-unit contraction order
# u = j*t + r (t = F/P rows per plane).  Under reference LSB-first packing
# that order is a permutation of natural k, historically fixed by permuting x
# at EVERY forward (permute_x_for_planes).  Folding applies the inverse
# permutation to the CODES once at pack time instead, so the kernel's natural
# stacking order becomes ascending-k and x ships unpermuted:
#
#   slot u = j*t + r of fold unit g reads packed element g*F + r*P + j,
#   so   codes_folded[g*F + r*P + j] = codes_natural[g*F + j*t + r].


def fold_plane_count(W_nbits: int, w_layout: int) -> int:
    """Planes-per-word count the ``w_layout`` fold was built with.

    w_layout=2 (integer W8): 4 full-lane BYTE planes — the kernels decode
    bytes with the f32 exponent trick, one plane per byte of the int32 word.
    w_layout=1: halfword planes — P = 16 // W_nbits for sub-byte codes, 2 for
    fp8 bit codes (each halfword holds two byte codes)."""
    if w_layout == 2:
        return 4
    return 2 if W_nbits == 8 else 16 // W_nbits


def fold_codes_for_planes(codes, n_planes: int, fold_gs: int):
    """Permute (N, K) codes along K so the plane kernels contract in natural
    k order (w_layout=1/2). ``n_planes`` = 16 // W_nbits for sub-byte codes,
    2 for fp8 byte codes (halfword planes), 4 for integer W8 (byte planes)."""
    xp = np if isinstance(codes, np.ndarray) else jnp
    n, k = codes.shape
    t = fold_gs // n_planes
    return xp.swapaxes(
        codes.reshape(n, k // fold_gs, n_planes, t), 2, 3).reshape(n, k)


def unfold_codes_for_planes(codes, n_planes: int, fold_gs: int):
    """Inverse of fold_codes_for_planes (recover natural/reference order)."""
    xp = np if isinstance(codes, np.ndarray) else jnp
    n, k = codes.shape
    t = fold_gs // n_planes
    return xp.swapaxes(
        codes.reshape(n, k // fold_gs, t, n_planes), 2, 3).reshape(n, k)


def unfold_rows_for_planes(b, n_planes: int, fold_gs: int):
    """unfold_codes_for_planes for the kernel-facing (K, N) orientation
    (rows = K). Used by the oracle to recover natural row order after
    unpacking a w_layout=1 matrix."""
    xp = np if isinstance(b, np.ndarray) else jnp
    k, n = b.shape
    t = fold_gs // n_planes
    return xp.swapaxes(
        b.reshape(k // fold_gs, t, n_planes, n), 1, 2).reshape(k, n)


# --- numpy twins (host-side checkpoint conversion without touching devices) ---

def pack_weights_over_cols_np(W_q: np.ndarray, W_nbits: int, packing_bitwidth: int = 32,
                              transpose: bool = True):
    packing_bitwidth, elems = _normalize_bitwidth(W_nbits, packing_bitwidth)
    rows, cols = W_q.shape
    v = W_q.astype(np.int32).reshape(rows, cols // elems, elems)
    packed = np.zeros((rows, cols // elems), dtype=np.int32)
    for j in range(elems):
        packed |= v[:, :, j] << (j * W_nbits)
    packed = packed.astype(np.dtype(PACKING_BITWIDTH_TO_JAX_DTYPE[packing_bitwidth].__name__))
    if transpose:
        packed = packed.T
    return packed, elems
