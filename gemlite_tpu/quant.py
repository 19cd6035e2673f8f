# SPDX-License-Identifier: Apache-2.0
"""Runtime quantization ops: dynamic activation quantizers + MX weight quantizer.

Activation quantizers are plain jnp — XLA fuses the absmax/scale/cast chain into
the surrounding computation (on TPU these are VPU ops folded into the matmul's
producer fusion), so unlike the reference there is no separate kernel launch
(reference quant_utils.py:268-347 uses dedicated Triton kernels). The behavior
matches: per-token absmax scales, clamp, round-to-nearest for int targets.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import DType, to_jax_dtype

__all__ = [
    "get_dtype_range",
    "scale_activations_per_token",
    "scale_activations_mxfp8",
    "scale_activations_mxfp4",
    "scale_activations_nvfp4",
    "scale_activations_mx_transposed",
    "WeightQuantizerMXFP",
    "FP4_VALUES",
]


def get_dtype_range(dtype) -> Tuple[float, float]:
    d = jnp.dtype(to_jax_dtype(dtype))
    if jnp.issubdtype(d, jnp.floating):
        info = jnp.finfo(d)
    else:
        info = jnp.iinfo(d)
    return float(info.min), float(info.max)


def scale_activations_per_token(x, w_dtype, fp32_scale: bool = True):
    """Per-token (per-row) symmetric dynamic quantization.

    x: (..., K) float -> (x_q in w_dtype, scales (M, 1) fp32) where
    scale = absmax/row / max_val, clamped to >= 1e-6. Matches reference
    quant_utils.py:231-253 numerics (round-to-nearest for int targets).
    """
    w_jdtype = to_jax_dtype(w_dtype)
    min_val, max_val = get_dtype_range(w_jdtype)
    orig_shape = x.shape
    xf = x.reshape(-1, x.shape[-1])
    if fp32_scale:
        xf = xf.astype(jnp.float32)
    scales = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / max_val
    scales = jnp.maximum(scales, 1e-6)
    q = jnp.clip(xf / scales, min_val, max_val)
    if not jnp.issubdtype(w_jdtype, jnp.floating):
        q = jnp.round(q)
    return q.astype(w_jdtype).reshape(orig_shape), scales.astype(jnp.float32)


# ---------------------------------------------------------------------------
# MX microscaling (OCP MX spec): power-of-two e8m0 block scales, group of 32.
# ---------------------------------------------------------------------------

_E8M0_EPS_EXP = -30  # minimum scale exponent, matches reference eps 2**-30


def _pow2_ceil(v):
    """Smallest power of two >= v, as (scale fp32, biased exponent int32).

    Bitwise on the fp32 representation (reference
    quant_utils.py:380-389 'next_power_of_2_bitwise'): exponent of v, +1 if any
    mantissa bits are set, clamped to the e8m0 range.
    """
    xi = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32)
    exp = ((xi >> 23) & 0xFF).astype(jnp.int32)
    mant = (xi & 0x7FFFFF).astype(jnp.int32)
    exp = exp + jnp.where(mant != 0, 1, 0)
    exp = jnp.clip(exp, 127 + _E8M0_EPS_EXP, 254)
    scales = jax.lax.bitcast_convert_type((exp << 23).astype(jnp.uint32), jnp.float32)
    return scales, exp


def _f32_pow2_to_e8m0_bits(scales):
    """Exact power-of-two fp32 scales -> e8m0 exponent bits (uint8).

    (Non-power-of-two inputs are rounded to the nearest power of two, which is
    what casting to float8_e8m0fnu would do — that dtype is unsupported by the
    TPU compiler, so e8m0 lives as raw uint8 bits throughout this package.)"""
    xi = jax.lax.bitcast_convert_type(scales.astype(jnp.float32), jnp.uint32)
    exp = ((xi >> 23) & 0xFF).astype(jnp.int32)
    mant = (xi & 0x7FFFFF).astype(jnp.int32)
    exp = exp + jnp.where(mant >= 0x400000, 1, 0)  # round half up
    return jnp.clip(exp, 0, 254).astype(jnp.uint8)


def e8m0_bits_to_f32(u8):
    """e8m0 exponent bits (uint8) -> 2^(v - 127) as float32."""
    return jax.lax.bitcast_convert_type(
        (jnp.asarray(u8).astype(jnp.uint32) << 23), jnp.float32
    )


def _group_view(x, group_size: int):
    """(..., K) -> (rows, group_size) view + metadata. K must be a group
    multiple: flat padding would blend the tail of one token into the next
    token's first scale group (cross-token contamination), and every
    caller's (M, K//gs) scale reshape requires divisibility anyway."""
    orig_shape = x.shape
    xf = x.reshape(-1, x.shape[-1])
    if xf.shape[-1] % group_size:
        raise ValueError(
            f"K={xf.shape[-1]} is not a multiple of group_size={group_size}")
    return xf.reshape(-1, group_size), orig_shape, xf.shape, 0


def scale_activations_mxfp8(x, w_dtype=jnp.float8_e4m3fn):
    """MXFP8 dynamic quantization: gs=32, e8m0 power-of-two scales.

    Returns (x_q fp8 of x.shape, scales (M, K//32) uint8-e8m0)."""
    group_size = 32
    min_val, max_val = get_dtype_range(w_dtype)
    g, orig_shape, flat2d, pad = _group_view(x, group_size)
    g = g.astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scales, exp = _pow2_ceil(amax / max_val)
    q = jnp.clip(g / scales, min_val, max_val).astype(w_dtype)
    q = q.reshape(-1)
    if pad:
        q = q[: flat2d[0] * flat2d[1]]
    x_q = q.reshape(orig_shape)
    scales_u8 = exp.astype(jnp.uint8).reshape(flat2d[0], flat2d[1] // group_size)
    return x_q, scales_u8


# fp4 (e2m1) codebook: the 16 representable magnitudes, index = sign<<3 | mag.
FP4_VALUES = np.array(
    [0, 0.5, 1, 1.5, 2, 3, 4, 6, -0.0, -0.5, -1, -1.5, -2, -3, -4, -6],
    dtype=np.float32,
)
_FP4_POS = FP4_VALUES[:8]
# decision thresholds between consecutive positive fp4 values
_FP4_THRESHOLDS = ((_FP4_POS[:-1] + _FP4_POS[1:]) / 2).astype(np.float32)


def round_to_fp4(x):
    """Round to the nearest fp4 (e2m1) value. Threshold-compare formulation:
    index = #(|x| > threshold_i), vectorized (no gather)."""
    ax = jnp.abs(x)[..., None]
    idx = jnp.sum((ax > jnp.asarray(_FP4_THRESHOLDS)).astype(jnp.int32), axis=-1)
    mag = jnp.asarray(_FP4_POS)[idx]
    return mag * jnp.sign(x), idx


def fp4_index(x_fp4):
    """fp4 float values -> uint8 codebook indices (sign<<3 | magnitude rank)."""
    ax = jnp.abs(x_fp4)[..., None]
    idx = jnp.sum((ax > jnp.asarray(_FP4_THRESHOLDS)).astype(jnp.int32), axis=-1)
    neg = (jnp.signbit(x_fp4)).astype(jnp.int32) << 3
    # -0 and +0 both map to 0|8; keep sign bit like the reference codebook
    return (idx | neg).astype(jnp.uint8)


def fp4_dequant(idx, dtype=jnp.float32):
    """uint8 codebook indices -> fp4 float values."""
    return jnp.asarray(FP4_VALUES, dtype=dtype)[idx.astype(jnp.int32)]


# x2-re-encoded fp4 (meta.mx_x2): codes 0<->1 swapped in the em field and
# the block scale pre-divided by 2, so every NONZERO code decodes as the
# bf16-normal (1 + m/2) * 2^e with e = em>>1 in 0..3 — a pure 2-op bit-field
# insert in the decode kernels (_fp4x2_planes), no subnormal cascade. Code
# em==1 is the zero marker (one 4-op mask). Exact: value' = 2 * fp4_value.
FP4X2_VALUES = np.array(
    [1.0, 0.0, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0,
     -1.0, -0.0, -2.0, -3.0, -4.0, -6.0, -8.0, -12.0],
    dtype=np.float32,
)


def fp4x2_dequant(idx, dtype=jnp.float32):
    """uint8 x2-re-encoded indices -> 2x fp4 float values (meta.mx_x2)."""
    return jnp.asarray(FP4X2_VALUES, dtype=dtype)[idx.astype(jnp.int32)]


def fp4x2_remap_packed(W_q_packed):
    """Remap packed fp4 nibbles to the x2 encoding IN the packed int32
    domain: flip bit0 of every nibble whose e bits (1..2) are zero — swaps
    codes 0<->1 (and 8<->9) per sign, which is the whole re-encode (normals
    keep their bits; the doubling comes from the new 2^e base). Position-
    independent, so it commutes with plane folding (bitpack.py)."""
    w = jnp.asarray(W_q_packed)
    assert w.dtype == jnp.int32
    u = w & 0x66666666                       # e bits of every nibble
    t = (u | (u >> 1)) & 0x22222222          # bit1 set iff e != 0
    flip = ((t ^ 0x22222222) >> 1) & 0x11111111
    return w ^ flip


def scale_activations_mxfp4(x):
    """MXFP4 dynamic quantization: gs=32, e8m0 scales, fp4 codebook indices
    packed 2 per byte (low nibble first). Returns (packed (..., K//2) uint8,
    scales (M, K//32) uint8-e8m0)."""
    group_size = 32
    max_val = 6.0
    g, orig_shape, flat2d, pad = _group_view(x, group_size)
    g = g.astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scales, exp = _pow2_ceil(amax / max_val)
    vals, _ = round_to_fp4(g / scales)
    idx = fp4_index(vals).reshape(-1)
    if pad:
        idx = idx[: flat2d[0] * flat2d[1]]
    idx = idx.reshape(flat2d)
    packed = (idx[:, 0::2] | (idx[:, 1::2] << 4)).astype(jnp.uint8)
    packed = packed.reshape(orig_shape[:-1] + (orig_shape[-1] // 2,))
    scales_u8 = exp.astype(jnp.uint8).reshape(flat2d[0], flat2d[1] // group_size)
    return packed, scales_u8


NVFP4_META_SCALE = 0.05  # global meta-scale, reference quant_utils.py:21


def scale_activations_nvfp4(x):
    """NVFP4: gs=16, fp8-e4m3 per-group scales x global meta-scale."""
    group_size = 16
    max_val = 6.0
    eps = 1e-6
    g, orig_shape, flat2d, pad = _group_view(x, group_size)
    g = g.astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    ideal = amax / max_val / NVFP4_META_SCALE
    scales_fp8 = jnp.clip(ideal, 0, 448.0).astype(jnp.float8_e4m3fn)
    scales_full = jnp.maximum(scales_fp8.astype(jnp.float32) * NVFP4_META_SCALE, eps)
    vals, _ = round_to_fp4(g / scales_full)
    idx = fp4_index(vals).reshape(-1)
    if pad:
        idx = idx[: flat2d[0] * flat2d[1]]
    idx = idx.reshape(flat2d)
    packed = (idx[:, 0::2] | (idx[:, 1::2] << 4)).astype(jnp.uint8)
    packed = packed.reshape(orig_shape[:-1] + (orig_shape[-1] // 2,))
    scales_out = scales_fp8.reshape(flat2d[0], flat2d[1] // group_size)
    return packed, scales_out


def scale_activations_mx_transposed(x, input_dtype: DType):
    """Micro-scaled activation quantization for the in-kernel csm-4 prefill
    path (reference gemm_kernels.py:519-524 streams tl.dot_scaled operands;
    here the kernel streams 1-byte codes + group scales instead of 2-byte
    fake-quantized activations).

    Returns ``(codesT, scalesT)``:

    * ``codesT`` — float8_e4m3fn of shape (K, M): the group-local quantized
      values, TRANSPOSED so the kernel's per-group scale expansion is a
      sublane-dim broadcast (a lane-dim 32-wide broadcast is not Mosaic-
      expressible). MXFP4/NVFP4 values (|v| in {0,.5,1,1.5,2,3,4,6}) are
      exactly representable in e4m3, so one container serves all three
      formats.
    * ``scalesT`` — float32 of shape (K // ags, M), ags = 16 for NVFP4 else
      32. Power-of-two (e8m0) for MXFP8/MXFP4; fp8-quantized x 0.05 meta
      scale for NVFP4.

    Bit-exactness contract: ``(codesT.astype(f32) * expand(scalesT))
    .astype(bf16)`` equals ``fake_quant_activations(x, input_dtype)`` so the
    in-kernel path and the fake-quant fallback are numerically identical.
    """
    group_size = 16 if input_dtype == DType.NVFP4 else 32
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    M, K = xf.shape
    g = xf.reshape(M, K // group_size, group_size)
    amax = jnp.max(jnp.abs(g), axis=2, keepdims=True)
    if input_dtype == DType.MXFP8:
        scales, _ = _pow2_ceil(amax / 448.0)
        q = jnp.clip(g / scales, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    elif input_dtype == DType.MXFP4:
        scales, _ = _pow2_ceil(amax / 6.0)
        vals, _ = round_to_fp4(g / scales)
        q = vals.astype(jnp.float8_e4m3fn)
    elif input_dtype == DType.NVFP4:
        ideal = amax / 6.0 / NVFP4_META_SCALE
        s8 = jnp.clip(ideal, 0, 448.0).astype(jnp.float8_e4m3fn)
        scales = jnp.maximum(s8.astype(jnp.float32) * NVFP4_META_SCALE, 1e-6)
        vals, _ = round_to_fp4(g / scales)
        q = vals.astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"not an MX activation dtype: {input_dtype}")
    codesT = q.reshape(M, K).T
    scalesT = scales[:, :, 0].astype(jnp.float32).T
    return codesT, scalesT


# ---------------------------------------------------------------------------
# Offline MX weight quantizer (pack-time). Mirrors the capability surface of
# reference WeightQuantizerMXFP (quant_utils.py:70-225): mxfp8 / mxfp4 / nvfp4
# with optional exhaustive scale-window search.
# ---------------------------------------------------------------------------

class WeightQuantizerMXFP:
    def __init__(self, compute_dtype=jnp.bfloat16, device=None):
        self.compute_dtype = compute_dtype
        self.device = device  # kept for API parity; placement is sharding-driven

    def quantize_mxfp8(self, W, index: bool = False, mx_fp8_dtype=jnp.float8_e4m3fn,
                       flush_subnormals: bool = True):
        group_size = 32
        min_val, max_val = get_dtype_range(mx_fp8_dtype)
        Wf = jnp.asarray(W).reshape(-1, group_size).astype(jnp.float32)
        amax = jnp.max(jnp.abs(Wf), axis=1, keepdims=True)
        # ceil-to-power-of-2; scales returned as e8m0 BITS (uint8) — the
        # float8_e8m0fnu dtype itself is rejected by the TPU compiler
        scales, exp = _pow2_ceil(amax / max_val)
        W_q = jnp.clip(Wf / scales, min_val, max_val).astype(mx_fp8_dtype)
        if flush_subnormals and index:
            # values < min_normal/max of the group amax round to {0,
            # +-min_normal}: the stored code set becomes subnormal-free, so
            # pack() selects the 3-op nosub plane decode (measured 73.6 ->
            # ~25 us at 4096^2 M=1: the cascade was serving MXFP8 weights).
            # Added error <= half a min-normal (2^-7 x scale for e4m3) —
            # under the e4m3 quantization step everywhere else.
            from .helper import _flush_fp8_subnormal_codes
            W_q = _flush_fp8_subnormal_codes(W_q)
        scales_e8m0 = exp.astype(jnp.uint8)
        if not index:
            W_q = W_q.astype(Wf.dtype)
        return W_q, scales_e8m0

    def quantize_mxfp4(self, W, window_size: int = 0, index: bool = False):
        group_size = 32
        max_val = 6.0
        eps = 2.0 ** _E8M0_EPS_EXP
        Wf = jnp.asarray(W).reshape(-1, group_size).astype(jnp.float32)
        amax = jnp.max(jnp.abs(Wf), axis=1, keepdims=True)
        log2_ideal = jnp.ceil(jnp.log2(jnp.maximum(amax / max_val, 1e-38)))
        if window_size == 0:
            scales = jnp.exp2(log2_ideal)
        else:
            # exhaustive search over power-of-two scale candidates around ideal
            offsets = jnp.arange(-window_size, window_size + 1, dtype=jnp.float32)
            cand = jnp.exp2(log2_ideal + offsets[None, :])  # (G, W)
            cand = jnp.maximum(cand, eps)
            q, _ = round_to_fp4(Wf[:, None, :] / cand[:, :, None])
            err = jnp.mean(jnp.abs(Wf[:, None, :] - q * cand[:, :, None]), axis=-1)
            best = jnp.argmin(err, axis=1, keepdims=True)
            scales = jnp.take_along_axis(cand, best, axis=1)
        scales = jnp.maximum(scales, eps)
        W_q, _ = round_to_fp4(Wf / scales)
        scales_e8m0 = _f32_pow2_to_e8m0_bits(scales)
        if index:
            W_q = fp4_index(W_q)
        return W_q, scales_e8m0

    def quantize_nvfp4(self, W, window_size: int = 0, index: bool = False):
        group_size = 16
        eps = 1e-6
        max_val = 6.0
        Wf = jnp.asarray(W).reshape(-1, group_size).astype(jnp.float32)
        amax = jnp.max(jnp.abs(Wf), axis=1, keepdims=True)
        ideal = amax / max_val / NVFP4_META_SCALE
        scales = jnp.clip(ideal, 0, 448.0).astype(jnp.float8_e4m3fn)
        if window_size > 0:
            # search over neighbouring fp8 codes (reference quant_utils.py:184-206)
            base = scales.astype(jnp.float32)
            offsets = jnp.arange(-window_size, window_size + 1, dtype=jnp.float32)
            # power-of-two neighbourhood around the ideal scale (dominates the
            # e4m3 code-space step for candidates of interest)
            cand = jnp.clip(jnp.maximum(base * jnp.exp2(offsets[None, :]),
                                        eps), 0, 448.0)   # e4m3 max: no NaN
            full = cand * NVFP4_META_SCALE
            q, _ = round_to_fp4(Wf[:, None, :] / full[:, :, None])
            # the reconstruction is q * (scale * META), so the error metric
            # must use `full` — scoring against `cand` degenerates to always
            # picking the smallest candidate
            err = jnp.mean(jnp.abs(Wf[:, None, :] - q * full[:, :, None]), axis=-1)
            best = jnp.argmin(err, axis=1, keepdims=True)
            scales = jnp.take_along_axis(cand, best, axis=1).astype(jnp.float8_e4m3fn)
        scales_full = jnp.maximum(scales.astype(jnp.float32) * NVFP4_META_SCALE, eps)
        W_q, _ = round_to_fp4(Wf / scales_full)
        if index:
            W_q = fp4_index(W_q)
        return W_q, scales

    def dequantize(self, W_q, scales, shape=None, dtype=None):
        if W_q.dtype == jnp.uint8:
            W_q = fp4_dequant(W_q)
        if scales.dtype == jnp.uint8:  # e8m0 bits
            scales = e8m0_bits_to_f32(scales)
        group_size = W_q.size // scales.size
        out = W_q.reshape(-1, group_size).astype(jnp.float32) * scales.reshape(-1, 1).astype(jnp.float32)
        if shape is not None:
            out = out.reshape(shape)
        return out.astype(self.compute_dtype if dtype is None else dtype)


# ---------------------------------------------------------------------------
# Native grouped-INT weight quantizer (HQQ-style error minimization)
# ---------------------------------------------------------------------------
def quantize_int_weights(weight, W_nbits: int = 4, group_size: int = 128,
                         iters: int = 12, optimize: bool = True,
                         clip_grid=None):
    """Grouped asymmetric INT quantization with alternating error refinement.

    The reference delegates error-minimizing INT quantization to the external
    ``hqq`` package (reference helper.py:339-370 builds HQQLinear); this is
    the native equivalent: min-max init, then ``iters`` rounds of alternating
    (a) re-rounding W_q under the current affine params and (b) per-group
    least-squares refit of (scale, zero) to the rounded codes — monotone on
    the tracked objective because the best iterate is kept.

    ``clip_grid``: optional iterable of range-shrink factors (e.g.
    ``(1.0, 0.9, 0.8, 0.7, 0.6)``); each group's (lo, hi) window is shrunk
    about its midpoint by each factor, quantized, and the per-group MSE-best
    init seeds the refit loop — at 2 bits the min-max window wastes most of
    the 4-code budget on outliers, so clipping is where the headroom is.

    Returns ``(W_q uint8 (N, K), scales f32 (G, 1), zeros f32 (G, 1))``,
    exactly the triple ``GemLiteLinear.pack`` / ``A16Wn_HQQ_INT.from_weights``
    expect (dequant = (W_q - zeros) * scales).
    """
    W = np.asarray(jax.device_get(weight), dtype=np.float32)
    orig_shape = W.shape
    g = W.reshape(-1, group_size)                       # (G, gs)
    qmax = float(2 ** W_nbits - 1)

    lo = g.min(axis=1, keepdims=True)
    hi = g.max(axis=1, keepdims=True)
    s = np.maximum((hi - lo) / qmax, 1e-8)              # (G, 1)
    z = -lo / s                                         # (G, 1)

    def quant(s, z):
        return np.clip(np.round(g / s + z), 0, qmax)

    def err(q, s, z):
        return np.mean((g - (q - z) * s) ** 2, axis=1, keepdims=True)

    q = quant(s, z)
    best = (err(q, s, z), q, s, z)
    if clip_grid is not None:
        mid = (lo + hi) / 2.0
        for r in clip_grid:
            if r == 1.0:
                continue
            lo_r = mid + (lo - mid) * r
            hi_r = mid + (hi - mid) * r
            s_r = np.maximum((hi_r - lo_r) / qmax, 1e-8)
            z_r = -lo_r / s_r
            q_r = quant(s_r, z_r)
            e_r = err(q_r, s_r, z_r)
            keep = e_r < best[0]
            best = (np.where(keep, e_r, best[0]),
                    np.where(keep, q_r, best[1]),
                    np.where(keep, s_r, best[2]),
                    np.where(keep, z_r, best[3]))
        q, s, z = best[1], best[2], best[3]
    if optimize:
        for _ in range(iters):
            # least-squares refit of W ~ s*q + b per group (b = -s*z)
            qm = q.mean(axis=1, keepdims=True)
            wm = g.mean(axis=1, keepdims=True)
            var = ((q - qm) ** 2).mean(axis=1, keepdims=True)
            cov = ((q - qm) * (g - wm)).mean(axis=1, keepdims=True)
            s_new = np.where(var > 1e-12, cov / np.maximum(var, 1e-12), s)
            s_new = np.where(np.abs(s_new) > 1e-8, s_new, s)
            z_new = -(wm - s_new * qm) / s_new
            q_new = quant(s_new, z_new)
            e_new = err(q_new, s_new, z_new)
            keep = e_new < best[0]
            best = (np.where(keep, e_new, best[0]),
                    np.where(keep, q_new, best[1]),
                    np.where(keep, s_new, best[2]),
                    np.where(keep, z_new, best[3]))
            q, s, z = best[1], best[2], best[3]

    _, q, s, z = best
    W_q = q.reshape(orig_shape).astype(np.uint8)
    return (jnp.asarray(W_q), s.astype(np.float32), z.astype(np.float32))
