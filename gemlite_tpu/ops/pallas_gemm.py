# SPDX-License-Identifier: Apache-2.0
"""Fused dequantize+matmul Pallas (Mosaic-TPU) kernel family.

One parametrized kernel covers all five reference kernel families (GEMV,
GEMV_REVSPLITK, GEMV_SPLITK, GEMM_SPLITK, GEMM — reference
triton_kernels/gemm_kernels.py etc.): on a systolic-array machine the GPU
distinctions (warp-level GEMV, split-K atomics) do not apply, so the families
differ only in their block configurations:

  * grid (M/bm, N/bn, K/bk) with K innermost ("arbitrary" semantics) — the
    TPU-native replacement for split-K atomic accumulation: each output block
    is revisited across K steps with a VMEM fp32/int32 scratch accumulator,
    and Mosaic double-buffers the streamed weight blocks (HBM -> VMEM DMA
    overlapped with compute).
  * decode regime (M<=64): small bm, wide bn, bk a multiple of group_size so
    one scales/zeros load covers >=1 full groups (the GEMV_REVSPLITK trick of
    amortizing metadata loads, reference gemv_revsplitK_kernels.py:296-312,
    falls out naturally from bk = 2*group_size).
  * prefill regime: large square-ish blocks to maximize MXU occupancy.

In-kernel dequantization implements the 5 W_group_modes + channel_scale
epilogue (reference utils.py:57-89, gemm_kernels.py:392-404). Integer unpack
uses a broadcast-shift-mask + sublane-interleave reshape, which Mosaic lowers
without gathers; int8 activations take the int8xint8->int32 MXU path.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import DType, to_jax_dtype
from ..config import KernelConfig

__all__ = ["pallas_fused_matmul", "select_default_config", "can_use_pallas"]


def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Kernel body factory
# ---------------------------------------------------------------------------

def _fp4x2_decode(c, md):
    """x2-re-encoded fp4 codes (meta.mx_x2) -> doubled values: em==1 is the
    zero marker, else (1 + m/2) * 2^e (quant.FP4X2_VALUES)."""
    e = (c >> 1) & 3
    m = (c & 1).astype(jnp.float32)
    sgn = (c >> 3) & 1
    mag = jnp.left_shift(1, e).astype(jnp.float32) * (1.0 + 0.5 * m)
    mag = jnp.where((c & 7) == 1, 0.0, mag)
    return jnp.where(sgn == 1, -mag, mag).astype(md)


def _fp4_decode(c, md):
    """fp4-e2m1 codes (int) -> values, arithmetically (no gather/LUT):
    bits [s e1 e0 m]; e==0 -> 0.5*m (subnormal), else 2^(e-1) * (1 + m/2)."""
    e = (c >> 1) & 3
    m = (c & 1).astype(jnp.float32)
    sgn = (c >> 3) & 1
    mag = jnp.where(
        e == 0, 0.5 * m,
        jnp.left_shift(1, jnp.maximum(e - 1, 0)).astype(jnp.float32) * (1.0 + 0.5 * m),
    )
    return jnp.where(sgn == 1, -mag, mag).astype(md)


def _e8m0_decode(u8):
    """e8m0 bits (uint8) -> 2^(v-127) via exponent-field bitcast."""
    return jax.lax.bitcast_convert_type(u8.astype(jnp.uint32) << 23, jnp.float32)


def _load_group_meta(ref, k, bk: int, gs_eff: int, bn: int, decode=None):
    """Slice this k-step's group metadata rows from the resident (G, bn) strip
    and expand to per-row (broadcastable against the (bk, bn) weight block).

    The strip's block index is constant over k, so Mosaic keeps it in VMEM
    across the K loop — one DMA per (i, j) tile, the TPU analogue of the
    reference's 'one scales load per RevSplitK double-step' trick."""
    if gs_eff >= bk:
        # one group row covers this whole k block (bk <= group size,
        # including the channel-wise case gs_eff == K): (1, bn) broadcasts
        # against the (bk, bn) weight block directly
        m = ref[pl.ds((k * bk) // gs_eff, 1), :]
        return decode(m) if decode is not None else m
    size = bk // gs_eff
    if size >= ref.shape[0]:
        # single k step covers all groups: whole-strip load, no slicing
        m = ref[...]
    else:
        # size >= 8 enforced by config selection: Mosaic requires provably
        # 8-aligned multi-row sublane slices
        start = pl.multiple_of(k * size, 8)
        m = ref[pl.ds(start, size), :]
    if decode is not None:
        m = decode(m)
    return jnp.broadcast_to(m[:, None, :], (size, gs_eff, bn)).reshape(bk, bn)


def _make_kernel(*, W_nbits, elems, W_group_mode, channel_scale_mode,
                 zero_is_scalar, has_scales, has_zeros, has_scales_x,
                 int_path, compute_jdtype, acc_jdtype, out_jdtype,
                 meta_f32, bk, bn, n_k, gs_eff_s=1, gs_eff_z=1,
                 w_codec=None, scale_codec=None):
    mask = (1 << W_nbits) - 1

    if scale_codec == "e8m0":
        s_decode = _e8m0_decode
    elif scale_codec == "nvfp4":
        s_decode = lambda s: s.astype(jnp.float32) * 0.05  # NVFP4 meta-scale
    else:
        s_decode = None

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
        s_ref = None
        z_ref = None
        sx_ref = None
        if has_scales:
            s_ref = refs[i]; i += 1
        if has_zeros:
            z_ref = refs[i]; i += 1
        if has_scales_x:
            sx_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        acc_ref = refs[i]

        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # ---- load + unpack weights ------------------------------------
        w = w_ref[...]
        if elems > 1:
            w32 = w.astype(jnp.int32)
            shifts = jax.lax.broadcasted_iota(jnp.int32, (1, elems, 1), 1) * W_nbits
            b = ((w32[:, None, :] >> shifts) & mask).reshape(bk, bn)
        else:
            b = w
        if w_codec == "fp4":
            b = _fp4_decode(b, jnp.float32 if meta_f32 else compute_jdtype)
        elif w_codec == "fp4x2":
            b = _fp4x2_decode(b, jnp.float32 if meta_f32 else compute_jdtype)

        # ---- dequantize (W_group_mode) ---------------------------------
        if W_group_mode > 0:
            md = jnp.float32 if meta_f32 else compute_jdtype
            if W_group_mode == 1:
                if zero_is_scalar:
                    z = z_ref[0, 0]
                    if int_path:
                        b = b.astype(jnp.int32) - z
                    else:
                        b = b.astype(md) - z.astype(md)
                else:
                    z = _load_group_meta(z_ref, k, bk, gs_eff_z, bn)
                    b = b.astype(md) - z.astype(md)
            elif W_group_mode == 2:
                s = _load_group_meta(s_ref, k, bk, gs_eff_s, bn, decode=s_decode)
                b = b.astype(md) * s.astype(md)
            elif W_group_mode == 3:
                s = _load_group_meta(s_ref, k, bk, gs_eff_s, bn)
                if zero_is_scalar:
                    z = z_ref[0, 0]
                    b = (b.astype(jnp.int32) - z).astype(md) * s.astype(md)
                else:
                    z = _load_group_meta(z_ref, k, bk, gs_eff_z, bn)
                    b = (b.astype(md) - z.astype(md)) * s.astype(md)
            elif W_group_mode == 4:
                s = _load_group_meta(s_ref, k, bk, gs_eff_s, bn)
                z = _load_group_meta(z_ref, k, bk, gs_eff_z, bn)
                b = b.astype(md) * s.astype(md) + z.astype(md)

        # ---- dot --------------------------------------------------------
        a = x_ref[...]
        if int_path:
            acc_ref[...] += jax.lax.dot_general(
                a, b.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc_ref[...] += jax.lax.dot_general(
                a.astype(compute_jdtype), b.astype(compute_jdtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_jdtype,
            )

        # ---- epilogue on last K step ------------------------------------
        @pl.when(k == n_k - 1)
        def _():
            acc = acc_ref[...].astype(jnp.float32)
            if channel_scale_mode == 1:
                acc = acc * s_ref[...].astype(jnp.float32)        # (1, bn) bcast
            elif channel_scale_mode == 2:
                acc = acc * sx_ref[...].astype(jnp.float32)       # (bm, 1) bcast
            elif channel_scale_mode == 3:
                acc = acc * sx_ref[...].astype(jnp.float32) * s_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(out_jdtype)

    return kernel


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------

def can_use_pallas(meta, M, N, K, cfg: KernelConfig) -> bool:
    """Shape/config constraints for the fused kernel; otherwise oracle."""
    if meta.channel_scale_mode == 4:  # MX path handled separately
        return False
    if getattr(meta, "w_code_dtype", 0):
        # fp8 BIT codes: this kernel's unpack treats packed words as integer
        # codes; fp8-coded layers are served by the plane kernels (or the
        # oracle, which bitcasts the unpacked bytes)
        return False
    if getattr(meta, "w_layout", 0):
        # folded (plane-order) weights: this kernel unpacks assuming the
        # reference LSB-first order; folded layers are guaranteed servable by
        # the plane kernels (pack-time _plane_fold_unit checks), and the
        # oracle unfolds for anything else
        return False
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if not bn or not bk or N % bn or K % bk:
        return False
    if bk % meta.elements_per_sample:
        return False
    if (bk // meta.elements_per_sample) < 8:  # packed block sublane minimum
        return False
    if bk % 128 and bk != K:  # x-block lane alignment
        return False
    gs = meta.group_size
    uses_group_meta = (meta.W_group_mode in (2, 3, 4)
                       or (meta.W_group_mode == 1 and not meta.zero_is_scalar))
    if uses_group_meta and 1 < gs < K and not _gs_block_ok(bk, gs, K):
        return False
    return True


def _gs_block_ok(bk: int, gs: int, K: int) -> bool:
    """Metadata slicing constraint: one group row per k block (bk <= gs),
    exactly one group (bk == gs), an 8-aligned multi-row slice, or a single
    k step covering all groups (bk == K -> whole-strip load)."""
    if gs % bk == 0 or bk == gs or bk == K:
        return True
    return bk % gs == 0 and (bk // gs) % 8 == 0


def _pick_bk(meta, K: int, budget: int) -> int:
    """Largest power-of-two block_k <= budget that divides K, is compatible
    with the group size (bk % gs == 0 or gs % bk == 0) and keeps the packed
    weight block at >= 8 sublanes."""
    elems = meta.elements_per_sample
    gs = meta.group_size if 1 < meta.group_size < K else K
    bk_min = 8 * elems
    bk = budget
    while bk >= bk_min:
        lane_ok = bk % 128 == 0 or bk == K
        if K % bk == 0 and lane_ok and _gs_block_ok(bk, gs, K):
            return bk
        bk //= 2
    if K <= budget and K >= bk_min:  # single-step fallback: bk == K
        return K
    return 0


def select_default_config(meta, M, N, K) -> KernelConfig:
    """Heuristic block sizes by batch regime (refined by the autotuner)."""
    if M <= 16:  # decode: wide N, deep K to amortize metadata loads
        bm, bn_pref, bk_budget = 16, (512, 256, 128), 1024
    elif M <= 64:  # small-batch decode
        bm, bn_pref, bk_budget = 64, (256, 128), 1024
    else:  # prefill: MXU-occupancy-first
        bm, bn_pref, bk_budget = 256, (256, 128), 512

    bn = next((b for b in bn_pref if N % b == 0), 0)
    bk = _pick_bk(meta, K, bk_budget)
    return KernelConfig(block_m=bm, block_n=bn, block_k=bk)


def pallas_fused_matmul(x, W_q, scales, zeros, scales_x, meta,
                        cfg: Optional[KernelConfig] = None,
                        interpret: Optional[bool] = None):
    """out[M, N] = channel_scale(x[M, K] @ dequant(W_q[K/e, N])).

    Pads M up to a block multiple (TPU sublane alignment) and slices back —
    the compilation-count analogue of the reference's M-bucketed autotune.
    """
    M, K = x.shape
    N = meta.out_features
    if cfg is None:
        cfg = select_default_config(meta, M, N, K)
    if interpret is None:
        interpret = _interpret_mode()

    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    Mp = _cdiv(M, bm) * bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
        if scales_x is not None and meta.channel_scale_mode in (2, 3):
            scales_x = jnp.pad(scales_x, ((0, Mp - M), (0, 0)))

    n_m, n_n, n_k = Mp // bm, N // bn, K // bk

    input_dtype = DType(meta.input_dtype)
    out_jdtype = to_jax_dtype(meta.output_dtype)
    meta_jdtype = to_jax_dtype(meta.meta_dtype)
    acc_is_int = DType(meta.acc_dtype) == DType.INT32

    # integer MXU path: int8 activations, raw/shift-only weights, int zeros
    int_path = (
        input_dtype == DType.INT8
        and meta.W_group_mode in (0, 1)
        and (meta.W_group_mode == 0 or meta.zero_is_scalar)
        and acc_is_int
        # packed W8 codes span 0..255: (code - z) only fits int8 when z is
        # exactly 128, which is not statically knowable — sub-byte codes
        # and native int8 weights always fit
        and (meta.elements_per_sample == 1 or meta.W_nbits < 8)
    )
    if int_path:
        compute_jdtype, acc_jdtype = jnp.int8, jnp.int32
    else:
        cj = to_jax_dtype(input_dtype)
        if not jnp.issubdtype(cj, jnp.floating) or jnp.dtype(cj).itemsize == 1:
            cj = jnp.bfloat16  # int8/fp8 fall back to bf16 compute off the int path
        compute_jdtype, acc_jdtype = cj, jnp.float32

    has_scales = scales is not None and (
        meta.W_group_mode in (2, 3, 4) or meta.channel_scale_mode in (1, 3)
    )
    has_zeros = zeros is not None and meta.W_group_mode in (1, 3, 4)
    has_scales_x = scales_x is not None and meta.channel_scale_mode in (2, 3)

    gs_eff_s = K // scales.shape[0] if (has_scales and meta.W_group_mode in (2, 3, 4)) else 1
    gs_eff_z = (K // zeros.shape[0]
                if (has_zeros and not meta.zero_is_scalar) else 1)

    # MX codecs: fp4 weight codes; e8m0 / nvfp4 scale encodings
    from ..dtypes import is_mx_dtype
    w_codec = None
    scale_codec = None
    if is_mx_dtype(input_dtype):
        if meta.W_nbits == 4:
            w_codec = "fp4x2" if getattr(meta, "mx_x2", 0) else "fp4"
        if has_scales:
            if input_dtype == DType.NVFP4:
                scale_codec = "nvfp4"
            elif scales.dtype == jnp.uint8:
                scale_codec = "e8m0"

    kernel = _make_kernel(
        W_nbits=meta.W_nbits,
        elems=meta.elements_per_sample,
        W_group_mode=meta.W_group_mode,
        channel_scale_mode=meta.channel_scale_mode,
        zero_is_scalar=bool(meta.zero_is_scalar),
        has_scales=has_scales,
        has_zeros=has_zeros,
        has_scales_x=has_scales_x,
        int_path=int_path,
        compute_jdtype=compute_jdtype,
        acc_jdtype=acc_jdtype,
        out_jdtype=out_jdtype,
        # dequant math in the compute dtype for bf16/fp16 (halves VPU work,
        # same precision the reference uses — meta loads are cast to fp16
        # there too); fp32 math everywhere else
        meta_f32=compute_jdtype not in (jnp.bfloat16, jnp.float16),
        bk=bk,
        bn=bn,
        n_k=n_k,
        gs_eff_s=gs_eff_s,
        gs_eff_z=gs_eff_z,
        w_codec=w_codec,
        scale_codec=scale_codec,
    )

    # ---- block specs -----------------------------------------------------
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // meta.elements_per_sample, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, W_q]

    def _meta_spec(t):
        """(G, N) group metadata rides as a full-K (G, bn) column strip whose
        block index is constant over k — Mosaic DMAs it once per (i, j) tile
        and the kernel slices the rows it needs per K step."""
        G = t.shape[0]
        return pl.BlockSpec((G, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)

    if has_scales:
        if meta.channel_scale_mode in (1, 3):
            # channel-wise epilogue scales: (1, N)
            in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales.reshape(1, N))
        else:
            in_specs.append(_meta_spec(scales))
            args.append(scales)
    if has_zeros:
        if meta.zero_is_scalar:
            in_specs.append(pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(zeros.reshape(1, 1).astype(jnp.int32))
        else:
            in_specs.append(_meta_spec(zeros))
            args.append(zeros)
    if has_scales_x:
        in_specs.append(pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales_x.astype(jnp.float32))

    out_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM)

    w_bytes = W_q.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(Mp * K * x.dtype.itemsize
                        + (K // meta.elements_per_sample) * N * w_bytes
                        + Mp * N * jnp.dtype(out_jdtype).itemsize),
        transcendentals=0,
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n, n_k),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_jdtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_jdtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    return out[:M] if Mp != M else out
