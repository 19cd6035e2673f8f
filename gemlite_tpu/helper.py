# SPDX-License-Identifier: Apache-2.0
"""Integration helpers ("processors").

Each processor converts existing float weights / layers into a packed
``GemLiteLinear`` with the right (input_dtype, output_dtype, scaled_activations)
triple and, where needed, post-pack overrides of the dequant modes — the same
capability surface as the reference helpers (reference helper.py:88-1062):

    A16W8_INT8 / A16W8_FP8          weight-only 8-bit channel-wise
    A16Wn (+ A16W{8,4,2,1}_HQQ_INT) weight-only grouped low-bit
    A8W8_INT8_dynamic / A8W8_FP8_dynamic   dynamic 8-bit act x 8-bit weights
    A8Wn_HQQ_INT_dynamic (+A8W4/A8W2)      fp8 act x packed low-bit weights
    A16W8_MXFP / A16W4_MXFP          weight-only MX microscaling (see mx.py)
    A8W8/A8Wn/A4W4_MXFP_dynamic, A4W4_NVFP_dynamic
    A16W158_INT / A8W158_INT_dynamic BitNet ternary

``from_weights`` accepts numpy / jnp arrays or torch tensors (converted on the
host); ``from_linear`` accepts torch ``nn.Linear``-likes (weight (N, K)) or any
object with ``weight``/``bias`` attributes; ``patch_model`` walks a module tree
replacing linear layers.
"""

import gc
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .core import GemLiteLinear
from .dtypes import DType, JAX_TO_DTYPE
from .utils.m_bucket import _BUCKETS

__all__ = [
    "A16W8", "A16W8_INT8", "A16W8_FP8",
    "A16Wn", "A16Wn_HQQ_INT",
    "A16W8_HQQ_INT", "A16W4_HQQ_INT", "A16W2_HQQ_INT", "A16W1_HQQ_INT",
    "A8W8_dynamic", "A8W8_INT8_dynamic", "A8W8_FP8_dynamic",
    "A8Wn_HQQ_INT_dynamic", "A8W4_HQQ_INT_dynamic", "A8W2_HQQ_INT_dynamic",
    "A16W158_INT", "A8W158_INT_dynamic",
    "patch_model", "warmup",
]

DEFAULT_FP8 = jnp.float8_e4m3fn


def _to_np(t):
    """numpy view of a torch tensor / jnp array / numpy array."""
    if t is None:
        return None
    if hasattr(t, "detach"):  # torch tensor/Parameter
        t = t.detach()
        if t.dtype is not None and "bfloat16" in str(t.dtype):
            return t.float().cpu().numpy().astype(np.float32)
        return t.cpu().numpy()
    return np.asarray(t)


def _float_dtype_of(arr, override=None):
    if override is not None:
        return jnp.dtype(override)
    d = jnp.dtype(jnp.asarray(arr).dtype) if not isinstance(arr, np.ndarray) else None
    if isinstance(arr, np.ndarray):
        d = jnp.dtype(arr.dtype)
    if d in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
        return d
    return jnp.dtype(jnp.bfloat16)


def _gem_dtype(jdtype) -> DType:
    return JAX_TO_DTYPE[jnp.dtype(jdtype)]


def _weight_bias_of(linear_layer):
    w = getattr(linear_layer, "weight", None)
    if w is None:
        w = getattr(linear_layer, "kernel", None)
        if w is not None:  # flax convention: kernel is (K, N)
            return _to_np(w).T, _to_np(getattr(linear_layer, "bias", None))
    return _to_np(w), _to_np(getattr(linear_layer, "bias", None))


def cleanup_linear(linear_layer, del_orig: bool = True):
    """Drop original weight references so the float copy can be GC'd."""
    if del_orig:
        for attr in ("weight", "kernel", "bias", "weight_scale", "W_q", "meta"):
            if hasattr(linear_layer, attr):
                try:
                    setattr(linear_layer, attr, None)
                except AttributeError:
                    pass
    gc.collect()


def _flush_fp8_subnormal_codes(W_q):
    """Round fp8 subnormal codes to the nearest of {0, +-min_normal} so the
    stored code set is subnormal-free and pack() selects the 5-op fast plane
    decode (core.LayerMeta.fp8_nosub; the TPU MXU/VPU flush bf16-subnormal
    inputs, so exact subnormal decode needs a ~25-op renorm cascade).
    Max added error: half a min-normal per affected weight (2^-7 * scale for
    e4m3) — beneath the e4m3 quantization step everywhere else. Pass
    ``flush_subnormals=False`` to the processor to keep reference-identical
    codes (exact decode either way; only speed differs)."""
    np_dt = np.asarray(jnp.zeros((), W_q.dtype)).dtype
    bits = np.asarray(W_q).view(np.uint8)
    e5m2 = W_q.dtype == jnp.float8_e5m2
    exp_m, man_m, half = (0x7C, 0x03, 2) if e5m2 else (0x78, 0x07, 4)
    sub = ((bits & exp_m) == 0) & ((bits & man_m) != 0)
    if not sub.any():
        return W_q
    snapped = np.where((bits & man_m) > half,
                       (bits & 0x80) | (man_m + 1),   # +-min normal
                       bits & 0x80)                   # +-0
    bits = np.where(sub, snapped, bits).astype(np.uint8)
    return jnp.asarray(bits.view(np_dt))


def _channelwise_quant_8bit(weight_f32: np.ndarray, fp8: Optional[object],
                            flush_subnormals: bool = True):
    """Symmetric per-output-channel 8-bit quantization (absmax / qmax)."""
    if fp8 is not None:
        info = jnp.finfo(fp8)
        min_val, max_val = float(info.min), float(info.max)
    else:
        min_val, max_val = -128.0, 127.0
    scales = np.abs(weight_f32).max(axis=1, keepdims=True) / max_val
    scales = np.maximum(scales, 1e-6)
    W_q = np.clip(weight_f32 / scales, min_val, max_val)
    if fp8 is not None:
        W_q = jnp.asarray(W_q, dtype=fp8)
        if flush_subnormals:
            W_q = _flush_fp8_subnormal_codes(W_q)
    else:
        W_q = jnp.asarray(np.round(W_q), dtype=jnp.int8)
    return W_q, scales.astype(np.float32)


# ---------------------------------------------------------------------------
# 16-bit activations x 8-bit weights, channel-wise (reference helper.py:88-170)
# ---------------------------------------------------------------------------
class A16W8:
    def __init__(self, device=None, dtype=None, fp8=None, fp32_scale=True, post_scale=False,
                 flush_subnormals=True):
        self.device = device  # API parity; placement is sharding-driven in JAX
        self.dtype = dtype
        self.fp8 = fp8
        self.fp32_scale = fp32_scale
        self.post_scale = post_scale
        self.flush_subnormals = flush_subnormals

    def from_weights(self, weight, bias=None, scales=None):
        weight = _to_np(weight)
        in_features, out_features = weight.shape[::-1]

        if scales is None:
            dtype = _float_dtype_of(weight, self.dtype)
            W_q, scales = _channelwise_quant_8bit(
                weight.astype(np.float32), self.fp8,
                flush_subnormals=self.flush_subnormals)
        else:
            assert np.asarray(_to_np(weight)).itemsize == 1, \
                "pre-quantized weight must be 8-bit"
            dtype = _float_dtype_of(scales, self.dtype)
            W_q, scales = jnp.asarray(weight), _to_np(scales)

        gem_dtype = _gem_dtype(dtype)
        layer = GemLiteLinear(
            8, group_size=in_features, in_features=in_features,
            out_features=out_features, input_dtype=gem_dtype, output_dtype=gem_dtype,
        )
        bias = jnp.asarray(_to_np(bias), dtype=dtype) if bias is not None else None
        if not self.fp32_scale:  # honor the flag (reference helper parity)
            scales = np.asarray(_to_np(scales), dtype=np.dtype(dtype))
        layer.pack(W_q, scales, zeros=None, bias=bias)

        if self.post_scale:  # scale after the K-sum
            layer.W_group_mode = 0
            layer.channel_scale_mode = 1
        else:  # pre-scale inside the K-loop
            layer.W_group_mode = 2
            layer.channel_scale_mode = 0
        return layer

    def from_linear(self, linear_layer, del_orig=True):
        w, b = _weight_bias_of(linear_layer)
        out = self.from_weights(w, b)
        cleanup_linear(linear_layer, del_orig)
        return out


class A16W8_INT8(A16W8):
    def __init__(self, device=None, dtype=None, fp32_scale=True, post_scale=False):
        super().__init__(device, dtype, fp8=None, fp32_scale=fp32_scale, post_scale=post_scale)


class A16W8_FP8(A16W8):
    def __init__(self, device=None, dtype=None, fp8=DEFAULT_FP8, fp32_scale=True,
                 post_scale=False, flush_subnormals=True):
        super().__init__(device, dtype, fp8=fp8, fp32_scale=fp32_scale,
                         post_scale=post_scale, flush_subnormals=flush_subnormals)


# ---------------------------------------------------------------------------
# 16-bit activations x packed Wn weights (reference helper.py:173-400)
# ---------------------------------------------------------------------------
class A16Wn:
    def __init__(self, device=None, dtype=None, packing_bitwidth=None, post_scale=False):
        self.device = device
        self.dtype = dtype
        self.packing_bitwidth = packing_bitwidth
        self.post_scale = post_scale
        self.quantizer_mx = None
        self.mx_fp8_dtype = DEFAULT_FP8

    def from_weights(self, W_q, scales, zeros, W_nbits, group_size, bias=None,
                     quant_type="INT"):
        assert quant_type in ("INT", "MXFP"), f"invalid quant_type {quant_type}"
        if quant_type == "MXFP":
            from .mx import pack_mxfp_layer  # deferred: needs MX kernels
            return pack_mxfp_layer(
                W_q, scales, W_nbits, dtype=self.dtype, bias=bias,
                scaled_activations=False,
            )

        W_q = _to_np(W_q)
        scales_np = _to_np(scales)
        zeros_np = _to_np(zeros)
        dtype = _float_dtype_of(scales_np, self.dtype)
        gem_dtype = _gem_dtype(dtype)

        in_features, out_features = W_q.shape[::-1]
        bias = jnp.asarray(_to_np(bias), dtype=dtype) if bias is not None else None

        layer = GemLiteLinear(
            W_nbits, group_size=group_size, in_features=in_features,
            out_features=out_features, input_dtype=gem_dtype,
            output_dtype=gem_dtype, scaled_activations=False,
        )
        layer.pack(
            jnp.asarray(W_q, jnp.uint8), scales_np.astype(np.dtype(dtype)),
            zeros_np.astype(np.dtype(dtype)), bias=bias,
            packing_bitwidth=self.packing_bitwidth,
        )
        if group_size == in_features:
            if self.post_scale:   # unpack+shift in-loop, channel scale after
                layer.W_group_mode = 1
                layer.channel_scale_mode = 1
            else:                 # full grouped dequant in-loop
                layer.W_group_mode = 3
                layer.channel_scale_mode = 0
        return layer

    def from_hqqlinear(self, hqq_layer, del_orig=True):
        assert hqq_layer.meta["axis"] == 1, "Only axis==1 is supported."
        W_nbits = hqq_layer.meta["nbits"]
        group_size = hqq_layer.meta["group_size"] or hqq_layer.in_features
        W_q = _to_np(hqq_layer.unpack(dtype=None)).reshape(hqq_layer.meta["shape"])
        scales = _to_np(hqq_layer.meta["scale"])
        zeros = _to_np(hqq_layer.meta["zero"])
        bias = _to_np(hqq_layer.bias) if hqq_layer.bias is not None else None
        cleanup_linear(hqq_layer, del_orig)
        return self.from_weights(W_q, scales, zeros, W_nbits, group_size, bias, "INT")

    def mxfp_from_linear(self, linear_layer, W_nbits, del_orig=True):
        from .mx import mxfp_quantize_weight, pack_mxfp_layer
        w, bias = _weight_bias_of(linear_layer)
        W_q, scales = mxfp_quantize_weight(w, W_nbits, fp8_dtype=self.mx_fp8_dtype)
        cleanup_linear(linear_layer, del_orig)
        return pack_mxfp_layer(W_q, scales, W_nbits, dtype=self.dtype, bias=bias,
                               scaled_activations=False)


class A16Wn_HQQ_INT(A16Wn):
    def __init__(self, device=None, dtype=None, W_nbits=None):
        super().__init__(device, dtype)
        self.W_nbits = W_nbits

    def from_weights(self, W_q, scales, zeros, bias=None):
        group_size = np.asarray(_to_np(W_q)).size // np.asarray(_to_np(scales)).size
        return super().from_weights(W_q, scales, zeros, self.W_nbits, group_size,
                                    bias, "INT")

    def from_float_weights(self, weight, bias=None, group_size=128, iters=12,
                           clip_grid=None):
        """Quantize FLOAT weights with the native HQQ-style error-minimizing
        grouped-INT quantizer (quant.quantize_int_weights) and pack. The
        reference delegates this step to the external hqq package
        (helper.py:339-370); here it is built in. ``clip_grid`` enables the
        range-shrink search (the sub-4-bit quality lever; see
        quant.quantize_int_weights)."""
        from .quant import quantize_int_weights
        W_q, scales, zeros = quantize_int_weights(
            _to_np(weight), self.W_nbits, group_size, iters=iters,
            clip_grid=clip_grid)
        return self.from_weights(W_q, scales, zeros, bias)


class A16W8_HQQ_INT(A16Wn_HQQ_INT):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, W_nbits=8)


class A16W4_HQQ_INT(A16Wn_HQQ_INT):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, W_nbits=4)


class A16W2_HQQ_INT(A16Wn_HQQ_INT):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, W_nbits=2)


class A16W1_HQQ_INT(A16Wn_HQQ_INT):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, W_nbits=1)


# ---------------------------------------------------------------------------
# dynamic 8-bit activations x 8-bit weights (reference helper.py:405-497)
# ---------------------------------------------------------------------------
class A8W8_dynamic:
    def __init__(self, device=None, dtype=None, fp8=None, fp32_scale=True,
                 flush_subnormals=True):
        self.device = device
        self.dtype = dtype
        self.fp8 = fp8
        self.fp32_scale = fp32_scale
        self.flush_subnormals = flush_subnormals

    def from_weights(self, weight, bias=None, scales=None):
        weight = _to_np(weight)
        in_features, out_features = weight.shape[::-1]
        input_dtype = _gem_dtype(self.fp8) if self.fp8 is not None else DType.INT8

        if scales is None:
            dtype = _float_dtype_of(weight, self.dtype)
            W_q, scales = _channelwise_quant_8bit(
                weight.astype(np.float32), self.fp8,
                flush_subnormals=self.flush_subnormals)
        else:
            assert np.asarray(weight).itemsize == 1, "pre-quantized weight must be 8-bit"
            dtype = _float_dtype_of(scales, self.dtype)
            W_q, scales = jnp.asarray(weight), _to_np(scales)

        gem_dtype = _gem_dtype(dtype)
        layer = GemLiteLinear(
            8, group_size=in_features, in_features=in_features,
            out_features=out_features, input_dtype=input_dtype,
            output_dtype=gem_dtype, scaled_activations=True,
        )
        bias = jnp.asarray(_to_np(bias), dtype=dtype) if bias is not None else None
        layer.pack(W_q, scales.astype(np.float32 if self.fp32_scale else np.dtype(dtype)),
                   zeros=None, bias=bias)
        # post-scale both activations and weights after the int/fp8 K-sum
        layer.W_group_mode = 0
        layer.channel_scale_mode = 3
        return layer

    def from_linear(self, linear_layer, del_orig=True):
        w, b = _weight_bias_of(linear_layer)
        out = self.from_weights(w, b)
        cleanup_linear(linear_layer, del_orig)
        return out


class A8W8_INT8_dynamic(A8W8_dynamic):
    def __init__(self, device=None, dtype=None):
        super().__init__(device, dtype, fp8=None)


A8W8_int8_dynamic = A8W8_INT8_dynamic


class A8W8_FP8_dynamic(A8W8_dynamic):
    def __init__(self, device=None, dtype=None, fp8=DEFAULT_FP8,
                 flush_subnormals=True):
        super().__init__(device, dtype, fp8=fp8,
                         flush_subnormals=flush_subnormals)


A8W8_fp8_dynamic = A8W8_FP8_dynamic


# ---------------------------------------------------------------------------
# dynamic FP8 activations x packed Wn weights (reference helper.py:502-655)
# ---------------------------------------------------------------------------
class A8Wn_HQQ_INT_dynamic(A16Wn):
    def __init__(self, device=None, packing_bitwidth=None, dtype=None,
                 post_scale=False, fp8=DEFAULT_FP8, fp32_scale=False, W_nbits=None):
        assert W_nbits is not None, "W_nbits must be 8, 4, 2 or 1"
        super().__init__(device, dtype, packing_bitwidth, post_scale)
        self.fp8 = fp8
        self.fp32_scale = fp32_scale
        self.W_nbits = W_nbits

    def from_weights(self, W_q, scales, zeros, bias=None):
        W_q = _to_np(W_q)
        scales_np = _to_np(scales)
        zeros_np = _to_np(zeros)
        group_size = W_q.size // scales_np.size
        dtype = _float_dtype_of(scales_np, self.dtype)
        gem_dtype = _gem_dtype(dtype)
        input_dtype = _gem_dtype(self.fp8)
        in_features, out_features = W_q.shape[::-1]
        bias = jnp.asarray(_to_np(bias), dtype=dtype) if bias is not None else None

        layer = GemLiteLinear(
            self.W_nbits, group_size=group_size, in_features=in_features,
            out_features=out_features, input_dtype=input_dtype,
            output_dtype=gem_dtype, scaled_activations=True,
        )
        layer.pack(
            jnp.asarray(W_q, jnp.uint8),
            scales_np.astype(np.float32 if self.fp32_scale else np.dtype(dtype)),
            zeros_np.astype(np.dtype(dtype)), bias=bias,
            packing_bitwidth=self.packing_bitwidth, fma_mode=False,
        )
        if group_size == in_features:
            if self.post_scale:
                layer.W_group_mode = 1
                layer.channel_scale_mode = 3
            else:
                layer.W_group_mode = 3
                layer.channel_scale_mode = 2
        return layer

    def from_hqqlinear(self, hqq_layer, del_orig=True):
        assert hqq_layer.meta["axis"] == 1, "Only axis==1 is supported."
        W_q = _to_np(hqq_layer.unpack(dtype=None)).reshape(hqq_layer.meta["shape"])
        scales = _to_np(hqq_layer.meta["scale"])
        zeros = _to_np(hqq_layer.meta["zero"])
        bias = _to_np(hqq_layer.bias) if hqq_layer.bias is not None else None
        cleanup_linear(hqq_layer, del_orig)
        return self.from_weights(W_q, scales, zeros, bias)


class A8W4_HQQ_INT_dynamic(A8Wn_HQQ_INT_dynamic):
    def __init__(self, device=None, packing_bitwidth=None, dtype=None,
                 post_scale=False, fp8=DEFAULT_FP8, fp32_scale=False):
        super().__init__(device, packing_bitwidth, dtype, post_scale, fp8,
                         fp32_scale, W_nbits=4)


class A8W2_HQQ_INT_dynamic(A8Wn_HQQ_INT_dynamic):
    def __init__(self, device=None, packing_bitwidth=None, dtype=None,
                 post_scale=False, fp8=DEFAULT_FP8, fp32_scale=False):
        super().__init__(device, packing_bitwidth, dtype, post_scale, fp8,
                         fp32_scale, W_nbits=2)


# ---------------------------------------------------------------------------
# BitNet ternary (reference helper.py:950-1062)
# ---------------------------------------------------------------------------
class A16W158_INT:
    """BitNet b1.58: ternary weights {-1, 0, +1} stored as 2-bit (W_q = w + 1),
    one scalar weight_scale broadcast to a per-channel scale column."""

    def __init__(self, device=None, dtype=None, fp32_scale=True):
        self.device = device
        self.dtype = dtype
        self.fp32_scale = fp32_scale

    def _build(self, weight, weight_scale, bias, input_dtype, channel_scale_mode,
               scaled_activations):
        weight = _to_np(weight)
        dtype = _float_dtype_of(weight, self.dtype)
        gem_dtype = _gem_dtype(dtype)
        out_features, in_features = weight.shape
        W_q = jnp.asarray(weight + 1, jnp.uint8)
        ws = float(np.asarray(_to_np(weight_scale)).reshape(-1)[0])
        scales = np.full((out_features, 1), ws,
                         dtype=np.float32 if self.fp32_scale else np.dtype(dtype))
        bias = jnp.asarray(_to_np(bias), dtype=dtype) if bias is not None else None

        layer = GemLiteLinear(
            2, group_size=in_features, in_features=in_features,
            out_features=out_features,
            input_dtype=input_dtype if input_dtype is not None else gem_dtype,
            output_dtype=gem_dtype, scaled_activations=scaled_activations,
        )
        layer.pack(W_q, scales=scales, zeros=1, bias=bias)
        layer.W_group_mode = 1  # shift only (subtract the +1 offset)
        layer.channel_scale_mode = channel_scale_mode
        return layer

    def from_weights(self, weight, weight_scale, bias=None):
        return self._build(weight, weight_scale, bias, None, 1, False)

    def from_bitlinear(self, linear_layer, del_orig=True):
        out = self.from_weights(linear_layer.weight, linear_layer.weight_scale,
                                linear_layer.bias)
        cleanup_linear(linear_layer, del_orig)
        return out


class A8W158_INT_dynamic(A16W158_INT):
    def from_weights(self, weight, weight_scale, bias=None):
        return self._build(weight, weight_scale, bias, DType.INT8, 3, True)

    def from_bitlinear(self, linear_layer, del_orig=True):
        out = self.from_weights(linear_layer.weight, linear_layer.weight_scale,
                                linear_layer.bias)
        cleanup_linear(linear_layer, del_orig)
        return out


# ---------------------------------------------------------------------------
# Model patching + warmup (reference helper.py:34-85, 1068-1119)
# ---------------------------------------------------------------------------
def _is_linear_like(m) -> bool:
    w = getattr(m, "weight", None)
    if w is None:
        return False
    shape = getattr(w, "shape", None)
    return shape is not None and len(shape) == 2 and callable(m)


def patch_model(model, processor, skip_modules=("lm_head", "vision", "visual"),
                group_size=64, device=None):
    """Recursively replace linear layers in a (torch or python-object) module
    tree with processor-converted GemLiteLinear layers."""
    use_hqq = hasattr(processor, "from_hqqlinear") and not hasattr(processor, "from_linear")
    if use_hqq:
        try:
            from hqq.core.quantize import HQQLinear, BaseQuantizeConfig  # noqa: F401
        except ImportError as e:
            raise ImportError("This processor requires the `hqq` package.") from e

    def convert(layer, name):
        if any(s in name for s in skip_modules):
            return layer
        if use_hqq:
            from hqq.core.quantize import HQQLinear, BaseQuantizeConfig
            W_nbits = processor.W_nbits
            cfg = BaseQuantizeConfig(nbits=W_nbits,
                                     group_size=group_size if W_nbits <= 4 else None)
            layer = HQQLinear(layer, quant_config=cfg)
            return processor.from_hqqlinear(layer)
        return processor.from_linear(layer)

    def assign(mod, name, value):
        # torch Modules reject non-Module children in __setattr__; bypass the
        # registry and store on the instance (attribute lookup still works)
        if hasattr(mod, "_modules") and name in getattr(mod, "_modules", {}):
            del mod._modules[name]
            object.__setattr__(mod, name, value)
        else:
            setattr(mod, name, value)

    def walk(mod, prefix=""):
        # torch-style: named_children
        if hasattr(mod, "named_children"):
            for name, child in list(mod.named_children()):
                full = f"{prefix}.{name}" if prefix else name
                if _is_linear_like(child):
                    assign(mod, name, convert(child, full))
                else:
                    walk(child, full)
        else:  # generic python object tree
            for name, child in list(vars(mod).items()):
                if child is None or isinstance(child, (int, float, str, bool)):
                    continue
                full = f"{prefix}.{name}" if prefix else name
                if _is_linear_like(child):
                    setattr(mod, name, convert(child, full))
                elif isinstance(child, (list, tuple)):
                    new = []
                    for i, c in enumerate(child):
                        if _is_linear_like(c):
                            new.append(convert(c, f"{full}.{i}"))
                        else:
                            # only objects can hold nested linears; walking
                            # a primitive would crash on vars()
                            if hasattr(c, "__dict__"):
                                walk(c, f"{full}.{i}")
                            new.append(c)
                    setattr(mod, name, type(child)(new))
                elif hasattr(child, "__dict__"):
                    walk(child, full)

    walk(model)
    return model


DEFAULT_WARMUP_BATCHES = sorted(set(_BUCKETS))[::-1]


def warmup(processor, shapes, batch_sizes=None, group_size=64, dtype=jnp.bfloat16):
    """Pre-compile the forward for every (shape, M-bucket) pair.

    On TPU 'autotune' == XLA compilation: warming the persistent compilation
    cache here is the analogue of the reference's Triton autotune warmup
    (reference helper.py:1068-1119). If autotune.py search is enabled for a
    family, this also triggers the block-size search per signature.
    """
    import jax

    if batch_sizes is None:
        batch_sizes = [b for b in DEFAULT_WARMUP_BATCHES if b <= 1024]
    rng = np.random.default_rng(0)
    layers = []
    for (out_features, in_features) in shapes:
        w = rng.normal(size=(out_features, in_features)).astype(np.float32) * 0.02
        layer = _warmup_layer(processor, w, group_size)
        layers.append(layer)
        for bs in batch_sizes:
            x = jnp.asarray(rng.normal(size=(bs, in_features)) * 0.1, dtype)
            jax.block_until_ready(layer(x))
    return layers


def _warmup_layer(processor, w, group_size):
    """Build one warmup layer from a float matrix, routing by the
    processor's actual constructor surface: BitNet via from_bitlinear on
    ternarized weights, self-quantizing processors (A16W8/A8W8/all MXFP)
    via from_linear, pre-quantized INT Wn via the HQQ-style group quant."""
    if hasattr(processor, "from_bitlinear"):

        class _Bit:
            weight = np.sign(w).astype(np.float32)
            weight_scale = float(np.abs(w).mean() + 1e-8)
            bias = None

        return processor.from_bitlinear(_Bit(), del_orig=False)
    if (type(processor).__module__.endswith(".mx")     # every MXFP/NVFP
            or getattr(processor, "W_nbits", None) is None):

        class _Lin:
            weight = w
            bias = None

        return processor.from_linear(_Lin(), del_orig=False)
    return _warmup_quantize(processor, w, group_size)


def _warmup_quantize(processor, w, group_size, **quant_kwargs):
    """Group-quantize a float matrix for Wn processors: min-max init + the
    native HQQ-style alternating error refinement (quant.quantize_int_weights
    — the reference delegates this step to the external hqq package).
    ``quant_kwargs`` pass through (iters=, clip_grid=)."""
    from .quant import quantize_int_weights
    nb = processor.W_nbits
    gs = group_size if nb <= 4 else w.shape[1]
    W_q, scales, zeros = quantize_int_weights(w, nb, gs, **quant_kwargs)
    return processor.from_weights(W_q, scales, zeros, bias=None)
