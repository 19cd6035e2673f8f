# SPDX-License-Identifier: Apache-2.0
"""Reference (non-Pallas) fused forward — the numerics oracle.

Implements the exact dequantization mode system of the reference
(/root/reference/gemlite/triton_kernels/utils.py:57-89 for W_group_mode,
gemm_kernels.py:392-404 for channel_scale_mode) as plain jnp. Every Pallas
kernel is validated against this, and it doubles as a correct (XLA-fused,
not-yet-roofline) fallback path on any backend.

W_group_mode — per-K-group dequantization of the weight block:
    0: none (raw b)
    1: b.astype(meta) - zeros                      (shift only)
    2: b.astype(meta) * scales                     (symmetric grouped)
    3: (b - zeros) * scales                        (asymmetric; cast order depends
                                                    on zero_is_scalar, see below)
    4: b.astype(meta) * scales + zeros             (fma; zeros pre-folded to -z*s)

channel_scale_mode — epilogue on the (M, N) accumulator:
    0: none
    1: acc * scales_w[None, :]
    2: acc * scales_x[:, None]
    3: acc * scales_x[:, None] * scales_w[None, :]
    4: grouped MX activation scales (handled in the MX kernels / mx oracle)
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..dtypes import DType, is_mx_dtype, to_jax_dtype
from ..bitpack import unfold_rows_for_planes, unpack_over_rows

__all__ = ["dequantize_ref", "forward_ref", "unpack_rows_ref", "plane_fold_unit"]


def plane_fold_unit(W_nbits: int, group_size: int, K: int, input_dtype) -> int:
    """Fold unit F of a w_layout=1 layer (mirrors core._plane_fold_unit)."""
    if is_mx_dtype(input_dtype):
        return 32 if DType(input_dtype) == DType.NVFP4 else group_size
    return group_size if 1 < group_size < K else 512


def unpack_rows_ref(W_q_packed, W_nbits: int, elements_per_sample: int, out_rows: int,
                    w_layout: int = 0, group_size: int = 0, input_dtype=DType.BF16):
    """Unpack a (Kp, N) packed matrix to (K, N) uint8 in original row order
    (w_layout=1 matrices are unfolded back to natural/reference order)."""
    if elements_per_sample == 1:
        return W_q_packed
    b = unpack_over_rows(W_q_packed, W_nbits, out_rows)
    if w_layout:
        from ..bitpack import fold_plane_count
        n_planes = fold_plane_count(W_nbits, w_layout)
        F = plane_fold_unit(W_nbits, group_size, out_rows, input_dtype)
        b = unfold_rows_for_planes(b, n_planes, F)
    return b


def _broadcast_group_meta(meta, K: int):
    """(G, N) group metadata -> (K, N) per-row metadata by repeating each group."""
    G = meta.shape[0]
    reps = K // G
    if reps == 1:
        return meta
    return jnp.repeat(meta, reps, axis=0, total_repeat_length=K)


def dequantize_ref(
    b,
    scales,
    zeros,
    *,
    W_group_mode: int,
    meta_dtype,
    zero_is_scalar: bool = False,
):
    """Dequantize an unpacked (K, N) integer/float weight matrix.

    ``scales``/``zeros`` are (G, N) group-transposed metadata (or None / scalar
    array for zeros). Cast ordering matches reference utils.py:57-89 exactly,
    including the zero_is_scalar branch of mode 3.
    """
    meta_dtype = to_jax_dtype(meta_dtype)
    K = b.shape[0]

    if W_group_mode == 0:
        return b

    s = _broadcast_group_meta(scales, K).astype(meta_dtype) if scales is not None else None
    if zeros is not None and not zero_is_scalar and getattr(zeros, "ndim", 0) == 2:
        z = _broadcast_group_meta(zeros, K).astype(meta_dtype)
    else:
        z = zeros  # scalar array or python int

    if W_group_mode == 1:  # shift only
        return b.astype(meta_dtype) - jnp.asarray(z).astype(meta_dtype)
    if W_group_mode == 2:  # symmetric grouped
        return b.astype(meta_dtype) * s
    if W_group_mode == 3:  # asymmetric / symmetric with shift
        if zero_is_scalar:
            return (b.astype(jnp.int32) - jnp.asarray(z).astype(jnp.int32)).astype(meta_dtype) * s
        return (b.astype(meta_dtype) - z) * s
    if W_group_mode == 4:  # fma: b * scales + zeros (zeros := -z*s folded at pack)
        return b.astype(meta_dtype) * s + z
    raise ValueError(f"Invalid W_group_mode: {W_group_mode}")


def forward_ref(
    x,
    W_q_packed,
    scales,
    zeros,
    scales_x,
    *,
    W_nbits: int,
    group_size: int,
    elements_per_sample: int,
    W_group_mode: int,
    channel_scale_mode: int,
    input_dtype: int,
    output_dtype: int,
    acc_dtype: int,
    meta_dtype: int,
    zero_is_scalar: bool = False,
    w_layout: int = 0,
    w_code_dtype: int = 0,
):
    """Oracle fused forward: out = channel_scale(x @ dequant(unpack(W_q))).

    Shapes: x (M, K); W_q_packed (K // elements_per_sample, N) packed ints, or
    (K, N) raw weights when elements_per_sample == 1; scales/zeros (G, N);
    scales_x (M, 1) fp32 or None. Returns (M, N) in output_dtype.

    Matches the reference compute chain (gemm_kernels.py:345-406): dequant to
    meta_dtype -> dot(a, b.astype(input_compute)) with acc_dtype accumulation ->
    epilogue channel scaling in meta_dtype -> cast to output_dtype.
    """
    out_jdtype = to_jax_dtype(output_dtype)
    meta_jdtype = to_jax_dtype(meta_dtype)
    K = x.shape[-1]

    b = unpack_rows_ref(W_q_packed, W_nbits, elements_per_sample, K,
                        w_layout=w_layout, group_size=group_size,
                        input_dtype=input_dtype)
    if w_code_dtype:
        # W_q holds fp8 BIT PATTERNS packed 4-per-int32 (A8W8-FP8 path):
        # reinterpret the unpacked bytes as fp8 values
        b = jax.lax.bitcast_convert_type(
            b.astype(jnp.uint8), to_jax_dtype(DType(w_code_dtype)))
    b = dequantize_ref(
        b, scales, zeros,
        W_group_mode=W_group_mode,
        meta_dtype=meta_dtype if W_group_mode > 0 else jnp.float32,
        zero_is_scalar=zero_is_scalar,
    )

    # Dot: integer path keeps int8xint8->int32 on the MXU; everything else fp32 acc.
    in_jdtype = to_jax_dtype(input_dtype)
    use_int_acc = (
        DType(acc_dtype) == DType.INT32
        and not jnp.issubdtype(jnp.asarray(b).dtype, jnp.floating)
        and jnp.issubdtype(in_jdtype, jnp.integer)
    )
    if use_int_acc:
        acc = jax.lax.dot_general(
            x.astype(jnp.int8), b.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc = jax.lax.dot_general(
            x.astype(jnp.float32), jnp.asarray(b).astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Epilogue channel scaling (reference gemm_kernels.py:392-404).
    # Integer meta dtypes can occur in the no-weight-metadata case; the
    # epilogue multiply must then happen in fp32.
    if not jnp.issubdtype(meta_jdtype, jnp.floating):
        meta_jdtype = jnp.float32
    if channel_scale_mode == 1:  # weight-only channel-wise
        acc = acc.astype(meta_jdtype) * scales.reshape(1, -1).astype(meta_jdtype)
    elif channel_scale_mode == 2:  # activation-only
        acc = acc.astype(meta_jdtype) * scales_x.reshape(-1, 1).astype(meta_jdtype)
    elif channel_scale_mode == 3:  # weight + activation
        acc = (
            acc.astype(meta_jdtype)
            * scales_x.reshape(-1, 1).astype(meta_jdtype)
            * scales.reshape(1, -1).astype(meta_jdtype)
        )
    elif channel_scale_mode == 4:
        raise NotImplementedError("mode 4 (MX grouped activation scales) is handled by the MX path")

    return acc.astype(out_jdtype)
