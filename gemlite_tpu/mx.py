# SPDX-License-Identifier: Apache-2.0
"""MX microscaling (OCP MXFP8/MXFP4) and NVFP4 support.

Reference behavior (reference helper.py:660-945, gemm_kernels.py:423-547):
weights are quantized to fp8-e4m3 bytes or fp4-e2m1 codes with power-of-two
e8m0 block scales (group 32), or NVFP4 (fp8-e4m3 block scales x global
meta-scale 0.05, group 16); activations are either left in fp16/bf16
(A16W*_MXFP), quantized per-token to fp8 (post_scale=True), or micro-scaled
like the weights (channel_scale_mode 4).

TPU design: there is no mxfp MMA on the MXU, so the block-scaled dot
(tl.dot_scaled in the reference) is decomposed:
  * activations are fake-quantized OUTSIDE the kernel (quantize->dequantize to
    bf16; exact, since fp8/fp4 values times power-of-two scales are
    representable in bf16) — they are small and XLA fuses the chain;
  * weights stay compressed to the kernel and are decoded in-kernel:
    fp4 codes -> values arithmetically (shift/select, no gather), e8m0 scales
    via exponent-bitcast, then a plain MXU dot in the compute dtype.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .core import GemLiteLinear, LayerMeta
from .dtypes import DType, JAX_TO_DTYPE, to_jax_dtype
from .quant import (
    e8m0_bits_to_f32,
    WeightQuantizerMXFP,
    FP4_VALUES,
    NVFP4_META_SCALE,
    fp4_dequant,
    round_to_fp4,
    _pow2_ceil,
)

__all__ = [
    "mxfp_quantize_weight", "pack_mxfp_layer", "mx_forward_ref",
    "fake_quant_activations",
    "A16Wn_MXFP", "A16W8_MXFP", "A16W4_MXFP",
    "A8Wn_MXFP_dynamic", "A8W8_MXFP_dynamic", "A8W4_MXFP_dynamic",
    "A4W4_MXFP_dynamic", "A4W4_NVFP_dynamic",
]


# ---------------------------------------------------------------------------
# Weight quantization + layer construction
# ---------------------------------------------------------------------------

def mxfp_quantize_weight(W, W_nbits: int, fp8_dtype=jnp.float8_e4m3fn,
                         nvfp4: bool = False, window_size: int = 0,
                         flush_subnormals: bool = True):
    """float (N, K) -> (W_q, scales) in MX storage form.

    MXFP8: W_q fp8 (N, K), scales e8m0 (N, K//32).
    MXFP4: W_q uint8 fp4 codes (N, K), scales e8m0 (N, K//32).
    NVFP4: W_q uint8 fp4 codes (N, K), scales fp8-e4m3 (N, K//16).

    flush_subnormals (MXFP8 only): round fp8-subnormal codes to
    {0, +-min_normal} so pack() selects the 3-op nosub decode path; pass
    False for reference-identical stored codes."""
    W = jnp.asarray(np.asarray(W))
    N, K = W.shape
    q = WeightQuantizerMXFP(compute_dtype=jnp.float32)
    if nvfp4:
        W_q, scales = q.quantize_nvfp4(W, window_size=window_size, index=True)
        gs = 16
    elif W_nbits == 8:
        W_q, scales = q.quantize_mxfp8(W, index=True, mx_fp8_dtype=fp8_dtype,
                                       flush_subnormals=flush_subnormals)
        gs = 32
    elif W_nbits == 4:
        W_q, scales = q.quantize_mxfp4(W, window_size=window_size, index=True)
        gs = 32
    else:
        raise ValueError(f"MXFP supports W_nbits in (4, 8), got {W_nbits}")
    return W_q.reshape(N, K), scales.reshape(N, K // gs)


def pack_mxfp_layer(W_q, scales, W_nbits: int, dtype=None, bias=None,
                    scaled_activations: bool = False, input_dtype=None):
    """Build a GemLiteLinear from MX-quantized weights.

    input_dtype defaults to MXFP16/MXBF16 (weight-only) by compute dtype;
    dynamic processors pass MXFP8 / MXFP4 / NVFP4 explicitly."""
    W_q = jnp.asarray(np.asarray(W_q)) if not isinstance(W_q, jnp.ndarray) else W_q
    scales = jnp.asarray(np.asarray(scales)) if not isinstance(scales, jnp.ndarray) else scales
    N, K = W_q.shape
    group_size = K // scales.shape[-1]

    dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(jnp.bfloat16)
    if input_dtype is None:
        input_dtype = DType.MXFP16 if dtype == jnp.dtype(jnp.float16) else DType.MXBF16
    out_dtype = JAX_TO_DTYPE[dtype]

    layer = GemLiteLinear(
        W_nbits, group_size=group_size, in_features=K, out_features=N,
        input_dtype=input_dtype, output_dtype=out_dtype,
        scaled_activations=scaled_activations,
    )
    bias = jnp.asarray(np.asarray(bias), dtype=dtype) if bias is not None else None
    # e8m0 scales may arrive as float8_e8m0fnu; pack() normalizes to uint8 view
    if scales.dtype == jnp.float8_e8m0fnu:
        scales = jax.lax.bitcast_convert_type(scales, jnp.uint8)
    layer.pack(W_q, scales, zeros=None, bias=bias)
    return layer


# ---------------------------------------------------------------------------
# Activation fake-quantization (quantize -> dequantize to compute dtype)
# ---------------------------------------------------------------------------

def _e8m0_to_f32(u8):
    return e8m0_bits_to_f32(u8)


def fake_quant_activations(x, input_dtype: DType, compute_dtype=jnp.bfloat16):
    """Emulate micro-scaled activation quantization: round x to the MX grid
    and return the dequantized bf16 values (exact representation)."""
    group_size = 16 if input_dtype == DType.NVFP4 else 32
    orig_shape = x.shape
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    g = xf.reshape(-1, group_size)

    if input_dtype == DType.MXFP8:
        amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        scales, _ = _pow2_ceil(amax / 448.0)
        q = jnp.clip(g / scales, -448.0, 448.0).astype(jnp.float8_e4m3fn)
        out = q.astype(jnp.float32) * scales
    elif input_dtype == DType.MXFP4:
        amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        scales, _ = _pow2_ceil(amax / 6.0)
        vals, _ = round_to_fp4(g / scales)
        out = vals * scales
    elif input_dtype == DType.NVFP4:
        amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
        ideal = amax / 6.0 / NVFP4_META_SCALE
        s8 = jnp.clip(ideal, 0, 448.0).astype(jnp.float8_e4m3fn)
        full = jnp.maximum(s8.astype(jnp.float32) * NVFP4_META_SCALE, 1e-6)
        vals, _ = round_to_fp4(g / full)
        out = vals * full
    else:
        raise ValueError(f"not an MX activation dtype: {input_dtype}")

    return out.reshape(orig_shape).astype(compute_dtype)


def mxfp_quantize_layer_for_autotune(N, K, input_dtype, rng=None):
    """Synthetic MX layer for the autotuner: quantize random weights to the
    given MX format and pack with that input_dtype (its type id keys the
    cache entries)."""
    rng = rng or np.random.default_rng(0)
    d = DType(input_dtype) if not isinstance(input_dtype, DType) else input_dtype
    W = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32)
    W_nbits = 8 if d == DType.MXFP8 else 4
    W_q, scales = mxfp_quantize_weight(W, W_nbits, nvfp4=(d == DType.NVFP4))
    return pack_mxfp_layer(W_q, scales, W_nbits, dtype=jnp.bfloat16,
                           input_dtype=d)


# ---------------------------------------------------------------------------
# Oracle MX forward (tests + fallback)
# ---------------------------------------------------------------------------

def mx_dequantize_weight_ref(W_q_packed, scales, meta: LayerMeta):
    """Packed MX weights -> full (K, N) float32 matrix."""
    K = meta.in_features

    def _unfold(codes, n_planes):
        if not getattr(meta, "w_layout", 0):
            return codes
        from .bitpack import unfold_rows_for_planes
        F = 32 if DType(meta.input_dtype) == DType.NVFP4 else meta.group_size
        return unfold_rows_for_planes(codes, n_planes, F)

    if meta.W_nbits == 4:
        from .bitpack import unpack_over_rows
        codes = _unfold(unpack_over_rows(W_q_packed, 4, K), 4)  # (K, N) codes
        if getattr(meta, "mx_x2", 0):
            # x2 re-encode (LayerMeta.mx_x2): doubled values, and the stored
            # e8m0 scales are already pre-decremented — exact round trip
            from .quant import fp4x2_dequant
            vals = fp4x2_dequant(codes)
        else:
            vals = fp4_dequant(codes)
    elif W_q_packed.dtype == jnp.int32:
        # fp8 bits packed 4-per-int32 (core.pack MXFP8 path)
        from .bitpack import unpack_over_rows
        codes = _unfold(unpack_over_rows(W_q_packed, 8, K), 2)  # fp8 bit rows
        fp8 = (jnp.float8_e5m2 if meta.w_code_dtype == DType.FP8e5.value
               else jnp.float8_e4m3fn)
        vals = jax.lax.bitcast_convert_type(codes, fp8).astype(jnp.float32)
    else:
        vals = W_q_packed.astype(jnp.float32)  # fp8 stored (K, N)
    G = scales.shape[0]
    gs_eff = K // G
    if DType(meta.input_dtype) == DType.NVFP4:
        s = scales.astype(jnp.float32) * NVFP4_META_SCALE
    else:
        s = _e8m0_to_f32(scales)
    s_rows = jnp.repeat(s, gs_eff, axis=0, total_repeat_length=K)
    return vals * s_rows


def mx_forward_ref(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
    """jnp oracle for the MX path. x must already be the compute-dtype
    activations (fake-quantized upstream when dynamic)."""
    W = mx_dequantize_weight_ref(W_q, scales, meta)
    acc = jax.lax.dot_general(
        x.astype(jnp.float32), W,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if meta.channel_scale_mode == 2 and scales_x is not None:
        acc = acc * scales_x.reshape(-1, 1).astype(jnp.float32)
    return acc.astype(to_jax_dtype(meta.output_dtype))


# ---------------------------------------------------------------------------
# Processors (reference helper.py:372-400, 660-945)
# ---------------------------------------------------------------------------

def _wb(layer_or_w, bias):
    from .helper import _weight_bias_of
    if bias is None and (hasattr(layer_or_w, "weight") or hasattr(layer_or_w, "kernel")):
        return _weight_bias_of(layer_or_w)
    return layer_or_w, bias


class A16Wn_MXFP:
    """Weight-only MXFP8/MXFP4: activations stay fp16/bf16.

    flush_subnormals (MXFP8 only): True (default) rounds fp8-subnormal weight
    codes at quantize time so the fast nosub decode serves the layer; pass
    False for reference-identical stored codes (helper.py A16W8 documents the
    same trade-off)."""

    def __init__(self, device=None, dtype=None, W_nbits=None,
                 fp8=jnp.float8_e4m3fn, flush_subnormals=True):
        self.flush_subnormals = flush_subnormals
        self.device = device
        self.dtype = dtype if dtype is not None else jnp.bfloat16
        self.W_nbits = W_nbits
        self.mx_fp8_dtype = fp8

    def from_weights(self, W_q, scales, bias=None):
        return pack_mxfp_layer(W_q, scales, self.W_nbits, dtype=self.dtype,
                               bias=bias, scaled_activations=False)

    def from_linear(self, linear_layer, del_orig=True):
        from .helper import _weight_bias_of, cleanup_linear
        w, bias = _weight_bias_of(linear_layer)
        W_q, scales = mxfp_quantize_weight(
            w, self.W_nbits, self.mx_fp8_dtype,
            flush_subnormals=self.flush_subnormals)
        cleanup_linear(linear_layer, del_orig)
        return self.from_weights(W_q, scales, bias)


class A16W8_MXFP(A16Wn_MXFP):
    def __init__(self, device=None, dtype=None, fp8=jnp.float8_e4m3fn,
                 flush_subnormals=True):
        super().__init__(device, dtype, W_nbits=8, fp8=fp8,
                         flush_subnormals=flush_subnormals)


class A16W4_MXFP(A16Wn_MXFP):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, W_nbits=4)


class A8Wn_MXFP_dynamic:
    """MXFP8 activations x MXFP8/MXFP4 weights.

    post_scale=False -> micro-scaled activations (reference channel_scale_mode
    4); post_scale=True -> per-token fp8 activations with post scaling
    (channel_scale_mode 2). Reference helper.py:732-806."""

    def __init__(self, device=None, dtype=None, post_scale=True, fp8=jnp.float8_e4m3fn,
                 W_nbits=None, flush_subnormals=True):
        assert W_nbits in (4, 8)
        self.device = device
        self.dtype = dtype if dtype is not None else jnp.bfloat16
        self.mx_fp8_dtype = fp8
        self.post_scale = post_scale
        self.W_nbits = W_nbits
        # MXFP8 weights only: False keeps reference-identical stored codes
        self.flush_subnormals = flush_subnormals

    def from_weights(self, weight, bias=None, scales=None):
        assert scales is not None, "Pre-quantized weights+scales required; use from_linear()."
        layer = pack_mxfp_layer(
            weight, scales, self.W_nbits, dtype=self.dtype, bias=bias,
            scaled_activations=True, input_dtype=DType.MXFP8,
        )
        layer.W_group_mode = 2  # in-kernel e8m0/fp4 weight dequant
        layer.channel_scale_mode = 2 if self.post_scale else 4
        return layer

    def from_linear(self, linear_layer, del_orig=True):
        from .helper import _weight_bias_of, cleanup_linear
        w, bias = _weight_bias_of(linear_layer)
        W_q, scales = mxfp_quantize_weight(
            w, self.W_nbits, self.mx_fp8_dtype,
            flush_subnormals=self.flush_subnormals)
        cleanup_linear(linear_layer, del_orig)
        return self.from_weights(W_q, bias=bias, scales=scales)


class A8W8_MXFP_dynamic(A8Wn_MXFP_dynamic):
    def __init__(self, device=None, dtype=None, post_scale=True, fp8=jnp.float8_e4m3fn,
                 flush_subnormals=True):
        super().__init__(device, dtype, post_scale, fp8, W_nbits=8,
                         flush_subnormals=flush_subnormals)


class A8W4_MXFP_dynamic(A8Wn_MXFP_dynamic):
    def __init__(self, device=None, dtype=None, post_scale=True, fp8=jnp.float8_e4m3fn):
        super().__init__(device, dtype, post_scale, fp8, W_nbits=4)


class A4W4_MXFP_dynamic:
    """MXFP4 activations x MXFP4 weights (reference helper.py:816-880)."""

    def __init__(self, device=None, dtype=None):
        self.device = device
        self.dtype = dtype if dtype is not None else jnp.bfloat16
        self.W_nbits = 4
        self.group_size = 32

    def from_weights(self, weight, bias=None, scales=None):
        assert scales is not None, "Pre-quantized weights+scales required; use from_linear()."
        layer = pack_mxfp_layer(
            weight, scales, 4, dtype=self.dtype, bias=bias,
            scaled_activations=True, input_dtype=DType.MXFP4,
        )
        layer.channel_scale_mode = 4
        return layer

    def from_linear(self, linear_layer, del_orig=True):
        from .helper import _weight_bias_of, cleanup_linear
        w, bias = _weight_bias_of(linear_layer)
        W_q, scales = mxfp_quantize_weight(w, 4)
        cleanup_linear(linear_layer, del_orig)
        return self.from_weights(W_q, bias=bias, scales=scales)


class A4W4_NVFP_dynamic:
    """NVFP4 activations x NVFP4 weights (reference helper.py:882-945)."""

    def __init__(self, device=None, dtype=None):
        self.device = device
        self.dtype = dtype if dtype is not None else jnp.bfloat16
        self.W_nbits = 4
        self.group_size = 16

    def from_weights(self, weight, bias=None, scales=None):
        assert scales is not None, "Pre-quantized weights+scales required; use from_linear()."
        layer = pack_mxfp_layer(
            weight, scales, 4, dtype=self.dtype, bias=bias,
            scaled_activations=True, input_dtype=DType.NVFP4,
        )
        layer.channel_scale_mode = 4
        return layer

    def from_linear(self, linear_layer, del_orig=True):
        from .helper import _weight_bias_of, cleanup_linear
        w, bias = _weight_bias_of(linear_layer)
        W_q, scales = mxfp_quantize_weight(w, 4, nvfp4=True)
        cleanup_linear(linear_layer, del_orig)
        return self.from_weights(W_q, bias=bias, scales=scales)
