# SPDX-License-Identifier: Apache-2.0
"""Prefill-regime (M > 64) fused dequant+matmul Pallas kernel.

The reference GEMM kernel dequantizes inside the K loop of every (m, n) tile
(gemm_kernels.py:249-413), so packed weights are re-streamed AND re-unpacked
for every M block — on TPU that leaves >3x performance on the table at
M >= 512 (measured v5e: 48 TF vs 173 TF for XLA's dense bf16 GEMM).

This kernel restructures the grid so both costs are paid exactly once:

    grid = (N/bn, K/bk, M/bm)   # m INNERMOST, semantics (parallel, arbitrary,
                                # arbitrary)

* The weight block index (k, j) is constant across the inner m sweep, so
  Mosaic never re-DMAs it.
* At m == 0 the block is unpacked (exponent-trick planes, see
  pallas_decode.py) and dequantized ONCE into a VMEM scratch ``bscr`` of
  shape (c, gs, bn); the m sweep then runs pure MXU batched dots against it.
* The output block (m, j) is revisited across k steps; a full-M fp32
  accumulator column ``acc`` (Mp, bn) lives in VMEM (4 MB at M=2048,
  bn=512) — the no-atomics split-K replacement, shared across the m grid.

x is pre-permuted outside the kernel to plane-major-within-group order
(permute_x_for_planes) so the dequantized scratch and the activations agree
on contraction order without any sublane interleave.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import DType, is_mx_dtype, to_jax_dtype
from ..config import KernelConfig
from .pallas_decode import (
    MAGIC16,
    OFFSET,
    _fp4_planes,
    _fp4x2_planes,
    _fp8_planes,
    _halfword_mask,
    _effective_gs,
    _interpret_mode,
    _cdiv,
    fp8_coded,
    permute_x_for_planes,
)


def _w8_int(meta) -> bool:
    """Integer-coded W8 (byte planes, P=4 fold — see pallas_decode)."""
    from ..dtypes import is_mx_dtype
    return (meta.W_nbits == 8 and not fp8_coded(meta)
            and not is_mx_dtype(DType(meta.input_dtype)))

__all__ = ["pallas_prefill_matmul", "can_use_prefill_kernel",
           "select_prefill_config", "pallas_dequantize", "can_use_dequantize"]


def _make_kernel(*, W_nbits, W_group_mode, channel_scale_mode, zero_is_scalar,
                 has_scales, has_zeros, has_scales_x, out_jdtype,
                 bm, bn, bk, gs, real_gs, n_k, n_m,
                 w_codec=None, scale_codec=None, pair_fused=False,
                 folded=False, odd_lo=False, build_only=False, csm_weight=0,
                 mx_ags=0, build_bf16=False, n_sub=1, fp8_nosub=False):
    # 8-bit integer codes: 4 full-lane BYTE planes via the f32 exponent
    # trick (offset-free TRUE codes, _w8_planes; w_layout=2 fold)
    w8_codes = w_codec is None and W_nbits == 8
    # subnormal-free fp8 weights under an e8m0 block scale (fp8_nosub == 2:
    # the pack-time scan ALSO proved every scale exponent E satisfies
    # 1 <= E <= 254 - gap): use the 3-op "scaled" raw-exponent planes
    # (v * 2**-gap) and fold the 2**gap back by biasing the e8m0 scale
    # decode — shift_left(E + gap, 23) — a zero-cost exponent add on the
    # tiny meta strip. The product (v * 2**-gap) * (s * 2**gap) is two
    # power-of-two-scaled bf16 normals, so it is BIT-EXACT equal to the
    # 8-op "true" variant's v * s. Mirrors the decode kernel's split-2**60
    # rescue (pallas_decode.py:155-160), but with no x/epilogue halves.
    fp8_scaled = (int(fp8_nosub) >= 2 and W_group_mode == 2
                  and scale_codec == "e8m0"
                  and w_codec in ("fp8w", "fp8w5"))
    exp_gap = 112 if w_codec == "fp8w5" else 120
    n_planes = 4 if w8_codes else 16 // W_nbits
    mask = _halfword_mask(W_nbits)
    # pair_fused (NVFP4 gs=16): planes are BUILT on fused 32-element blocks
    # (t_rows = 8, sublane-aligned) while scales stay per real 16-group; the
    # per-group scaling happens on a (c2, P, 2, t, bn) view before the flat
    # merge. gs arrives as 32 in this mode; the scale row count is bk // 16.
    c = bk // gs
    t_rows = gs // n_planes
    plane_magic, plane_dtype = MAGIC16, jnp.bfloat16
    offset = 0.0 if w8_codes else OFFSET

    def kernel(*refs):
        i = 0
        x_ref = sxm_ref = None
        if not build_only:
            x_ref = refs[i]; i += 1
            if mx_ags:
                # micro-scaled activations (channel_scale_mode 4): x arrives
                # TRANSPOSED as fp8 codes (bk, Mp) + per-group f32 scales
                # (bk // ags, Mp); the scale expansion is a sublane-dim
                # broadcast on the (c_act, ags, bm) leading-split view
                sxm_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
        wlo_ref = None
        if odd_lo:
            wlo_ref = refs[i]; i += 1
        s_ref = z_ref = sx_ref = None
        if has_scales:
            s_ref = refs[i]; i += 1
        if has_zeros:
            z_ref = refs[i]; i += 1
        if has_scales_x:
            sx_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        if build_only:
            acc_ref = bscr = None
            m = 0
        else:
            acc_ref = refs[i]; i += 1
            bscr = refs[i]
            m = pl.program_id(2)

        k = pl.program_id(1)

        if not build_only:
            @pl.when(jnp.logical_and(k == 0, m == 0))
            def _():
                # acc persists across the whole (k, m) sweep for this j block
                acc_ref[...] = jnp.zeros_like(acc_ref)

        c_meta = 2 * c if pair_fused else c
        # build arithmetic dtype: bf16 halves the VPU traffic of the f32
        # intermediate (codes/offsets stay exact below 256; the group-scale
        # multiply picks up one bf16 rounding) — opt-in via KernelConfig.
        # W8 nibble-built codes are <= 255 and bf16-exact too.
        cdt = jnp.bfloat16 if build_bf16 else jnp.float32
        bns = bn // n_sub

        def meta_rows(ref, h=0):
            sl = slice(h * bns, (h + 1) * bns) if n_sub > 1 else slice(None)
            if c_meta >= ref.shape[0]:
                mrow = ref[:, sl]
            elif bk < real_gs:
                mrow = ref[pl.ds((k * bk) // real_gs, 1), sl]
            else:
                mrow = ref[pl.ds(k * c_meta, c_meta), sl]
            if scale_codec == "e8m0" and ref is s_ref:
                if fp8_scaled:
                    # fold the planes' 2**-gap back in: 2^(E-127+gap), exact
                    mrow = mrow + exp_gap
                return jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(mrow, 23),
                    jnp.float32).astype(cdt)[:, None, :]
            mrow = mrow.astype(jnp.float32)[:, None, :]   # (c_meta, 1, bns)
            if scale_codec == "nvfp4" and ref is s_ref:
                mrow = mrow * 0.05
            return mrow.astype(cdt)

        # ---- dequantize one (bk, bns) weight sub-block -------------------
        def build_block(h=0):
            w = (w_ref[...] if n_sub == 1
                 else w_ref[:, h * bns:(h + 1) * bns])
            bn_ = bns
            if pair_fused:
                # NVFP4 gs=16: build on fused 32-blocks (t_rows = 8), scales
                # per real 16-group applied on a 5-D view of the plane stack.
                #   reference layout: slot (j, s) holds k = 32q + 4s + j
                #                     -> the pair axis is s // 4
                #   folded layout:    slot (j, s) holds k = 32q + 8j + s
                #                     -> the pair axis is j // 2
                planes = _fp4_planes(w, n_planes, c, t_rows, bn_)
                v = jnp.stack(planes, axis=1)               # (c, P, 8, bn_)
                s3 = meta_rows(s_ref, h)                    # (2c, 1, bn_)
                if folded:
                    sv = s3.reshape(c, 2, 1, 1, bn_)
                    v5 = v.reshape(c, 2, n_planes // 2, t_rows, bn_)
                else:
                    sv = s3.reshape(c, 1, 2, 1, bn_)
                    v5 = v.reshape(c, n_planes, 2, t_rows // 2, bn_)
                b = v5.astype(cdt) * sv
                return b.astype(jnp.bfloat16).reshape(bk, bn_)
            if w_codec in ("fp8w", "fp8w5"):
                # fp8_scaled: 3-op raw-exponent planes (v * 2**-gap), the gap
                # cancelled by the biased e8m0 scale decode above (bit-exact).
                # Else "true": exact values via exponent rebase + zero-mask
                # (+5 ops, amortized over all M rows by the dequant-once build)
                planes = _fp8_planes(
                    w, c, t_rows, bn_, e5m2=(w_codec == "fp8w5"),
                    nosub="scaled" if fp8_scaled
                    else ("true" if fp8_nosub else ""))
                v = jnp.stack(planes, axis=1).reshape(c, gs, bn_)
            elif w_codec == "fp4":
                planes = _fp4_planes(w, n_planes, c, t_rows, bn_)
                v = jnp.stack(planes, axis=1).reshape(c, gs, bn_)  # true values
            elif w_codec == "fp4x2":
                planes = _fp4x2_planes(w, n_planes, c, t_rows, bn_)
                v = jnp.stack(planes, axis=1).reshape(c, gs, bn_)  # 2x values
            elif w8_codes:
                from .pallas_decode import _w8_planes
                planes = _w8_planes(w, c, t_rows, bn_, False)      # TRUE codes
                v = jnp.stack(planes, axis=1).reshape(c, gs, bn_)
            else:
                planes = [
                    pltpu.bitcast(((w >> (W_nbits * j)) & mask) | plane_magic,
                                  plane_dtype).reshape(c, t_rows, bn_)
                    for j in range(n_planes)
                ]
                v = jnp.stack(planes, axis=1).reshape(c, gs, bn_)  # codes+OFFSET
                if odd_lo:
                    # odd bit-width: code = (hi << 1) | lo with the standard
                    # +128 offset; the -256 must precede the low-plane add
                    # (bf16 integers are exact only below 256 — see
                    # pallas_decode)
                    from .pallas_decode import _odd_lo_planes
                    vlo = _odd_lo_planes(wlo_ref[...], bk, bn_).reshape(c, gs, bn_)
                    v = (v * jnp.bfloat16(2.0) - jnp.bfloat16(256.0)) + vlo
            if W_group_mode == 0:
                # raw true-value codes (A8W8-FP8 post-scale: fp8 planes
                # decode exactly; channel scales apply post-accumulation)
                b = v.astype(cdt)
            elif W_group_mode == 2 and w_codec in ("fp4", "fp4x2",
                                                    "fp8w", "fp8w5"):
                # true-value planes: block scale only
                b = v.astype(cdt) * meta_rows(s_ref, h)
            elif W_group_mode == 2:
                s3 = meta_rows(s_ref, h)
                b = ((v.astype(cdt) - offset) * s3)
            elif W_group_mode == 1:
                if zero_is_scalar:
                    zoff = z_ref[0, 0].astype(cdt) + cdt(offset)
                else:
                    zoff = meta_rows(z_ref, h) + cdt(offset)
                b = v.astype(cdt) - zoff
            elif W_group_mode == 3:
                s3 = meta_rows(s_ref, h)
                if zero_is_scalar:
                    zoff = z_ref[0, 0].astype(cdt) + cdt(offset)
                else:
                    zoff = meta_rows(z_ref, h) + cdt(offset)
                b = (v.astype(cdt) - zoff) * s3
            elif W_group_mode == 4:
                s3 = meta_rows(s_ref, h)
                z3 = meta_rows(z_ref, h)
                b = (v.astype(cdt) - offset) * s3 + z3
            else:  # mode 0: raw codes (non-packed never routes here)
                b = v.astype(cdt) - offset
            # (c, gs, bn_) -> (bk, bn_): adjacent leading-dim merge, lanes
            # untouched — cheap, and done once per (j, k) block
            return b.astype(jnp.bfloat16).reshape(bk, bn_)

        if build_only:
            # pallas_dequantize: write the dense block out, folding the
            # channel-wise weight scales (csm 1/3) in like dequantize_full
            b2 = build_block()
            if csm_weight in (1, 3):
                b2 = (b2.astype(jnp.float32)
                      * s_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
            o_ref[...] = b2
            return

        # ---- MXU: one full-bk contraction per m block -------------------
        # x arrives as a FULL-M (Mp, bk) block indexed only by k: constant
        # across the (j, m) sweep, so Mosaic never re-DMAs it (re-fetching
        # (bm, bk) blocks per j cost ~n_j * M * bk bytes and was the M>=2048
        # tail). The m sweep slices rows in-kernel.
        if mx_ags:
            @pl.when(m == 0)
            def _():
                bscr[...] = build_block()

            c_act = bk // mx_ags
            x3 = x_ref[:, pl.ds(m * bm, bm)].reshape(
                c_act, mx_ags, bm).astype(jnp.float32)
            s3 = sxm_ref[:, pl.ds(m * bm, bm)][:, None, :]
            xs = (x3 * s3).astype(jnp.bfloat16).reshape(bk, bm)
            acc_ref[pl.ds(m * bm, bm), :] += jax.lax.dot_general(
                xs, bscr[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif n_sub == 1:
            @pl.when(m == 0)
            def _():
                bscr[...] = build_block()

            acc_ref[pl.ds(m * bm, bm), :] += jax.lax.dot_general(
                x_ref[pl.ds(m * bm, bm), :], bscr[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # sub-column pipeline: the VPU build of column h+1 carries no
            # data dependence on the MXU dot of column h, so Mosaic's
            # scheduler can overlap them instead of serializing the whole
            # cache build in front of the first dot
            @pl.when(m == 0)
            def _():
                bscr[:, :bns] = build_block(0)

            xm = x_ref[pl.ds(m * bm, bm), :]
            for h in range(n_sub):
                if h + 1 < n_sub:
                    @pl.when(m == 0)
                    def _(h=h):
                        bscr[:, (h + 1) * bns:(h + 2) * bns] = \
                            build_block(h + 1)
                acc_ref[pl.ds(m * bm, bm), h * bns:(h + 1) * bns] += \
                    jax.lax.dot_general(
                        xm, bscr[:, h * bns:(h + 1) * bns],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        # ---- epilogue on the last K step --------------------------------
        @pl.when(k == n_k - 1)
        def _():
            acc = acc_ref[pl.ds(m * bm, bm), :]
            if channel_scale_mode == 1:
                acc = acc * s_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 2:
                acc = acc * sx_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 3:
                acc = acc * sx_ref[...].astype(jnp.float32) \
                          * s_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(out_jdtype)

    return kernel


def _dequantize_blocks(meta, N, K):
    """The (bn, bk) pallas_dequantize uses — ONE selector shared with
    can_use_dequantize so approval and execution cannot diverge."""
    bn = next((b for b in (512, 256, 128) if N % b == 0), 0)
    bk = next((b for b in (2048, 1024, 512, 4096, 256, 128)
               if K % b == 0 and b % _effective_gs(meta, K, b) == 0), 0)
    return bn, bk


def can_use_dequantize(meta, N, K) -> bool:
    """pallas_dequantize serves the same layers as the prefill kernel (its
    build path). ONLY w_layout=1: the build's row order is the plane-stack
    slot order, which equals natural k order precisely when the codes were
    pack-time folded; reference-layout layers would come out K-permuted
    (use dequantize_full for those)."""
    from ..config import KernelConfig
    if not getattr(meta, "w_layout", 0):
        return False
    bn, bk = _dequantize_blocks(meta, N, K)
    if not bn or not bk:
        return False
    return can_use_prefill_kernel(meta, 8, N, K,
                                  KernelConfig(block_m=8, block_n=bn, block_k=bk))


def pallas_dequantize(W_q, scales, zeros, meta, interpret=None, W_lo=None):
    """Packed weights -> dense (K, N) bf16 in ONE streaming pass (the
    prefill kernel's dequant-cache build, written out instead of dotted).
    Channel-wise weight scales (csm 1/3) are folded in, matching
    autograd.dequantize_full."""
    if interpret is None:
        interpret = _interpret_mode()
    N, K = meta.out_features, meta.in_features
    bn, bk = _dequantize_blocks(meta, N, K)
    gs = _effective_gs(meta, K, bk)
    pair_fused = _is_pair_fused(meta, K, bk)
    if pair_fused:
        gs = 32

    from ..dtypes import is_mx_dtype
    from .pallas_decode import fp8_coded
    mx_fp8w = fp8_coded(meta)
    w_codec = scale_codec = None
    if mx_fp8w or (is_mx_dtype(DType(meta.input_dtype)) and meta.W_nbits == 4):
        if mx_fp8w:
            w_codec = "fp8w5" if meta.w_code_dtype == DType.FP8e5.value else "fp8w"
        else:
            w_codec = "fp4x2" if getattr(meta, "mx_x2", 0) else "fp4"
        if scales is not None:
            if scales.dtype == jnp.uint8:
                scale_codec = "e8m0"
                scales = scales.astype(jnp.int32)
            elif scales.dtype == jnp.float8_e4m3fn:
                scale_codec = "nvfp4"
                scales = scales.astype(jnp.float32)

    has_scales = scales is not None and (
        meta.W_group_mode in (2, 3, 4) or meta.channel_scale_mode in (1, 3))
    has_zeros = zeros is not None and meta.W_group_mode in (1, 3, 4)
    csm = meta.channel_scale_mode

    # the build closure of the prefill kernel, specialized to write out
    build = _make_kernel(
        W_nbits=meta.W_nbits, W_group_mode=meta.W_group_mode,
        channel_scale_mode=0, zero_is_scalar=bool(meta.zero_is_scalar),
        has_scales=has_scales, has_zeros=has_zeros, has_scales_x=False,
        out_jdtype=jnp.bfloat16, bm=8, bn=bn, bk=bk, gs=gs,
        real_gs=meta.group_size if 1 < meta.group_size < K else bk,
        n_k=K // bk, n_m=1, w_codec=w_codec, scale_codec=scale_codec,
        pair_fused=pair_fused, folded=bool(getattr(meta, "w_layout", 0)),
        odd_lo=W_lo is not None, build_only=True, csm_weight=csm,
        fp8_nosub=int(getattr(meta, "fp8_nosub", 0)))

    in_specs = [
        pl.BlockSpec((bk // meta.elements_per_sample, bn),
                     lambda j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    args = [W_q]
    if W_lo is not None:
        in_specs.append(pl.BlockSpec((bk // 32, bn), lambda j, k: (k, j),
                                     memory_space=pltpu.VMEM))
        args.append(W_lo)
    if has_scales:
        if csm in (1, 3):
            in_specs.append(pl.BlockSpec((1, bn), lambda j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales.reshape(1, N))
        else:
            G = scales.shape[0]
            in_specs.append(pl.BlockSpec((G, bn), lambda j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales)
    if has_zeros:
        if meta.zero_is_scalar:
            in_specs.append(pl.BlockSpec((1, 1), lambda j, k: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(zeros.reshape(1, 1).astype(jnp.float32))
        else:
            G = zeros.shape[0]
            in_specs.append(pl.BlockSpec((G, bn), lambda j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(zeros)

    return pl.pallas_call(
        build,
        grid=(N // bn, K // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bk, bn), lambda j, k: (k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _is_pair_fused(meta, K: int, bk: int) -> bool:
    """NVFP4 layers (fp4 codes, gs=16 fp8 scales) need the pair-fused plane
    build: a 16-group is only 4 bf16 plane rows (sublane-misaligned), so
    planes are built on fused 32-blocks and scales applied per real group."""
    from ..dtypes import is_mx_dtype
    return (is_mx_dtype(DType(meta.input_dtype)) and meta.W_nbits == 4
            and meta.group_size == 16 and meta.W_group_mode == 2
            and bk % 32 == 0)


def can_use_prefill_kernel(meta, M, N, K, cfg: KernelConfig,
                           mx_x: bool = False) -> bool:
    """Same dtype/packing/mode constraints as the decode kernel, without the
    M <= block_m restriction; plus a VMEM bound on the full-M accumulator.

    ``mx_x`` selects the in-kernel micro-scaled activation path (channel_
    scale_mode 4): transposed fp8 activation codes + per-group f32 scales
    stream into the kernel instead of bf16 fake-quantized activations."""
    from ..dtypes import is_mx_dtype
    from .pallas_decode import fp8_coded
    fp8w = fp8_coded(meta)
    w8_codes = (not is_mx_dtype(DType(meta.input_dtype)) and not fp8w
                and meta.W_nbits == 8 and meta.elements_per_sample == 4)
    if meta.W_nbits not in (1, 2, 4) and not (fp8w or w8_codes):
        return False
    if meta.elements_per_sample != 32 // meta.W_nbits:
        return False
    if fp8w:
        if meta.W_group_mode not in (0, 2):
            return False  # fp8 planes are TRUE values (raw or block-scaled)
    elif meta.W_group_mode not in (1, 2, 3, 4):
        return False
    if meta.channel_scale_mode == 4:
        # only the mx_x path serves csm 4 in-kernel; callers fall back to
        # exact bf16 fake-quant otherwise (core forward_functional)
        ags = 16 if DType(meta.input_dtype) == DType.NVFP4 else 32
        if (not mx_x or not is_mx_dtype(DType(meta.input_dtype))
                or getattr(meta, "w_layout", 0) != 1
                or cfg.block_k % ags):
            return False
    elif mx_x:
        return False
    if is_mx_dtype(DType(meta.input_dtype)):
        if not fp8w and (meta.W_nbits != 4 or meta.W_group_mode != 2):
            return False
    else:
        cj = to_jax_dtype(DType(meta.input_dtype))
        if jnp.dtype(cj).itemsize > 2:
            return False  # int8/fp8 exact in bf16; see pallas_decode note
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if not bn or not bk or N % bn or K % bk or bk % 128 or bm % 8:
        return False
    # NOTE: unlike the decode kernel there is no gs % 128 lane constraint —
    # the m-sweep dot contracts the full bk against the dequant cache, and x
    # is permuted outside the kernel; only the plane-stack sublane alignment
    # (t_rows % 8) applies. NVFP4 (gs=16, t_rows=4) is handled by the
    # pair-fused build: planes built on 32-blocks, scales applied per 16.
    n_planes = 4 if _w8_int(meta) else 16 // meta.W_nbits
    gs = _effective_gs(meta, K, bk)
    pair_fused = _is_pair_fused(meta, K, bk)
    if pair_fused:
        gs = 32
    if bk % gs or gs % n_planes or (gs // n_planes) % 8:
        return False
    real_gs = meta.group_size
    if 1 < real_gs < K:
        if (bk > real_gs and bk % real_gs) or (bk < real_gs and real_gs % bk):
            return False
        G = K // real_gs
        c = (bk // 16) if pair_fused else (bk // gs)
        if 1 < c < G and c % 8:
            return False
    # full-M accumulator + resident x block + dequant scratch must fit VMEM
    # comfortably: beyond ~56MB the x double-buffer chokes Mosaic's w-block
    # pipelining (measured: M=4096 single call 970-1160us vs 2x M=2048
    # chunks 870us), so larger M routes through dispatch-level row chunking
    Mp = _cdiv(M, bm) * bm
    acc_bytes = Mp * bn * 4
    scr_bytes = bk * bn * 2
    if mx_x:
        ags = 16 if DType(meta.input_dtype) == DType.NVFP4 else 32
        # fp8 codes (bk, Mp) + f32 group scales (bk/ags, Mp), double-buffered
        x_bytes = 2 * (bk * Mp + (bk // ags) * Mp * 4)
    else:
        x_bytes = 2 * Mp * bk * 2               # double-buffered (Mp, bk)
    w_bytes = 2 * (bk // meta.elements_per_sample) * bn * 4
    if acc_bytes + scr_bytes + x_bytes + w_bytes > 56 * 1024 * 1024:
        return False
    return True


def select_prefill_config(meta, M, N, K) -> KernelConfig:
    # Measured on v5e: the whole-M block (no m grid, full-M accumulator)
    # wins as long as it fits VMEM; x streams once, weights stream once.
    # (small M arises when this kernel covers the NVFP4 decode regime)
    bm = 8
    while bm < min(M, 2048):
        bm *= 2
    bm = max(bm, 128) if M > 64 else bm
    # narrow-n + deep-k blocks minimize accumulator traffic and build the
    # dequant cache once per j: (1024, 512, 4096) hit 175.6 TF at M=1024
    # on v5e (97% of the dense bf16 matmul)
    bn = next((b for b in (512, 1024, 256, 2048, 128) if N % b == 0), 0)
    gs = meta.group_size if 1 < meta.group_size < K else K
    bk = 0
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if K % cand or cand % 128:
            continue
        gse = min(gs, cand)
        if cand % gse:
            continue
        bk = cand
        break
    # e8m0-scaled MX layers: the bf16 build is EXACT (fp4/fp8 mantissas fit
    # bf16 and the block scale is a power of two), so take the halved VPU
    # build traffic by default — the build cost is what holds MX prefill
    # below the int-path's MXU fraction (BENCH_MATRIX round 3: 52% vs 91%)
    build_bf16 = (is_mx_dtype(DType(meta.input_dtype))
                  and DType(meta.input_dtype) != DType.NVFP4
                  and meta.W_group_mode == 2)
    return KernelConfig(block_m=bm, block_n=bn, block_k=bk,
                        build_bf16=build_bf16)


def pallas_prefill_matmul(x, W_q, scales, zeros, scales_x, meta,
                          cfg: Optional[KernelConfig] = None,
                          interpret: Optional[bool] = None,
                          W_lo=None, x_mx=None):
    """``x_mx`` (csm-4 in-kernel path): ``(codesT, scalesT)`` from
    quant.scale_activations_mx_transposed — fp8 codes (K, M) + f32 group
    scales (K // ags, M); ``x`` is ignored. Reference analogue: the MX GEMM's
    tl.dot_scaled operand streams (gemm_kernels.py:519-524)."""
    if x_mx is not None:
        xT, sxT = x_mx
        K, M = xT.shape
    else:
        M, K = x.shape
    N = meta.out_features
    if cfg is None:
        cfg = select_prefill_config(meta, M, N, K)
    if interpret is None:
        interpret = _interpret_mode()

    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    gs = _effective_gs(meta, K, bk)
    pair_fused = _is_pair_fused(meta, K, bk)
    if pair_fused:
        gs = 32
    n_k = K // bk
    out_jdtype = to_jax_dtype(meta.output_dtype)

    from ..dtypes import is_mx_dtype
    from .pallas_decode import fp8_coded
    mx_fp8w = fp8_coded(meta)
    mx_ags = 0
    Mp = _cdiv(M, bm) * bm
    if x_mx is not None:
        # transposed fp8 codes + f32 group scales; column-pad to Mp (zero
        # codes x zero scales contribute exactly 0 to the padded rows)
        mx_ags = 16 if DType(meta.input_dtype) == DType.NVFP4 else 32
        xq = None
        if Mp != M:
            xT = jnp.pad(xT, ((0, 0), (0, Mp - M)))
            sxT = jnp.pad(sxT, ((0, 0), (0, Mp - M)))
    else:
        xq = x.astype(jnp.bfloat16)
        if not getattr(meta, "w_layout", 0):
            # reference layout: the dequant cache rows are in plane-stack
            # order, matched by permuting x; folded layers (w_layout=1/2)
            # are already in natural k order so x ships as-is
            xq = permute_x_for_planes(xq, meta.W_nbits, gs,
                                      P=4 if _w8_int(meta) else 0)
        if Mp != M:
            xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
            if scales_x is not None and meta.channel_scale_mode in (2, 3):
                scales_x = jnp.pad(scales_x, ((0, Mp - M), (0, 0)))
    n_m = Mp // bm

    has_scales = scales is not None and (
        meta.W_group_mode in (2, 3, 4) or meta.channel_scale_mode in (1, 3))
    has_zeros = zeros is not None and meta.W_group_mode in (1, 3, 4)
    has_scales_x = scales_x is not None and meta.channel_scale_mode in (2, 3)

    w_codec = scale_codec = None
    if mx_fp8w or (is_mx_dtype(DType(meta.input_dtype)) and meta.W_nbits == 4):
        if mx_fp8w:
            w_codec = "fp8w5" if meta.w_code_dtype == DType.FP8e5.value else "fp8w"
        else:
            w_codec = "fp4x2" if getattr(meta, "mx_x2", 0) else "fp4"
        if has_scales:
            if scales.dtype == jnp.uint8:
                scale_codec = "e8m0"
                scales = scales.astype(jnp.int32)
            elif scales.dtype == jnp.float8_e4m3fn:
                scale_codec = "nvfp4"
                scales = scales.astype(jnp.float32)

    if x_mx is not None:
        in_specs = [
            pl.BlockSpec((bk, Mp), lambda j, k, m: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // mx_ags, Mp), lambda j, k, m: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // meta.elements_per_sample, bn),
                         lambda j, k, m: (k, j), memory_space=pltpu.VMEM),
        ]
        args = [xT, sxT, W_q]
    else:
        in_specs = [
            pl.BlockSpec((Mp, bk), lambda j, k, m: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // meta.elements_per_sample, bn),
                         lambda j, k, m: (k, j), memory_space=pltpu.VMEM),
        ]
        args = [xq, W_q]
    if W_lo is not None:
        in_specs.append(pl.BlockSpec((bk // 32, bn), lambda j, k, m: (k, j),
                                     memory_space=pltpu.VMEM))
        args.append(W_lo)
    if has_scales:
        if meta.channel_scale_mode in (1, 3):
            in_specs.append(pl.BlockSpec((1, bn), lambda j, k, m: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales.reshape(1, N))
        else:
            G = scales.shape[0]
            in_specs.append(pl.BlockSpec((G, bn), lambda j, k, m: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales)
    if has_zeros:
        if meta.zero_is_scalar:
            in_specs.append(pl.BlockSpec((1, 1), lambda j, k, m: (0, 0),
                                         memory_space=pltpu.SMEM))
            args.append(zeros.reshape(1, 1).astype(jnp.float32))
        else:
            G = zeros.shape[0]
            in_specs.append(pl.BlockSpec((G, bn), lambda j, k, m: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(zeros)
    if has_scales_x:
        in_specs.append(pl.BlockSpec((bm, 1), lambda j, k, m: (m, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales_x.astype(jnp.float32))

    # experimental knobs (autotunable): bf16 build arithmetic + sub-column
    # build/dot interleave; sanitized here so table entries tuned for other
    # layers can never produce an invalid launch
    build_bf16 = bool(getattr(cfg, "build_bf16", False)) and not pair_fused
    n_sub = int(getattr(cfg, "n_sub", 1) or 1)
    if (pair_fused or W_lo is not None or x_mx is not None or n_sub < 2
            or bn % n_sub or (bn // n_sub) % 128):
        n_sub = 1

    kernel = _make_kernel(
        W_nbits=meta.W_nbits,
        W_group_mode=meta.W_group_mode,
        channel_scale_mode=meta.channel_scale_mode,
        zero_is_scalar=bool(meta.zero_is_scalar),
        has_scales=has_scales,
        has_zeros=has_zeros,
        has_scales_x=has_scales_x,
        out_jdtype=out_jdtype,
        bm=bm, bn=bn, bk=bk, gs=gs,
        real_gs=meta.group_size if 1 < meta.group_size < K else bk,
        n_k=n_k, n_m=n_m,
        w_codec=w_codec, scale_codec=scale_codec, pair_fused=pair_fused,
        folded=bool(getattr(meta, "w_layout", 0)),
        odd_lo=W_lo is not None, mx_ags=mx_ags,
        build_bf16=build_bf16, n_sub=n_sub,
        fp8_nosub=int(getattr(meta, "fp8_nosub", 0)),
    )

    x_stream_bytes = (Mp * K + (K // mx_ags) * Mp * 4) if mx_ags else Mp * K * 2
    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(x_stream_bytes
                        + (K // meta.elements_per_sample) * N * 4
                        + Mp * N * jnp.dtype(out_jdtype).itemsize),
        transcendentals=0,
    )

    out = pl.pallas_call(
        kernel,
        grid=(N // bn, n_k, n_m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, k, m: (m, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_jdtype),
        scratch_shapes=[
            pltpu.VMEM((Mp, bn), jnp.float32),        # full-M accumulator
            pltpu.VMEM((bk, bn), jnp.bfloat16),       # dequant cache
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the full-M accumulator deliberately trades VMEM for single-pass
            # weight streaming; raise the default budget to match
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    return out[:M] if Mp != M else out
