# SPDX-License-Identifier: Apache-2.0
"""Decode-regime fused dequant+matmul Pallas kernel (float activations).

This is the TPU counterpart of the reference's GEMV / GEMV_REVSPLITK /
GEMM_SPLITK decode kernels (gemv_revsplitK_kernels.py:227-387 etc.), designed
around what actually limits an M<=64 low-bit matmul on a TPU: streaming the
packed weights from HBM and the VPU cost of unpacking them. Probed on a real
v5e, the three design decisions each bought a large factor (41.9us -> 17.1us
for A16W4 gs=128 4096x4096 M=1):

1. **Exponent-trick unpack** — no int->float conversion. For sub-byte codes,
   ``((w >> shift) & 0x000F000F) | 0x43004300`` reinterpreted as bf16 via
   ``pltpu.bitcast`` yields ``128 + code`` directly: two elements per int32 in
   3 VPU ops. ``pltpu.bitcast`` int32->bf16 splits the *sublane* dim (row 2i =
   low half, 2i+1 = high half), and under the reference LSB-first packing
   (bitpack.py) plane j of an int32 word lands at k = n_planes*m + j — a
   uniform stride, matched by a cheap XLA-side permutation of x.

2. **Raw-code dots + f32 post-dot correction** — zero per-element dequant
   work. sum_k x_k*(v_k - zoff_g)*s_g == s_g * (raw_g - zoff_g * xsum_g) with
   raw_g a per-group batched MXU dot on the raw (offset) codes. scales/zeros
   never touch a (bk, bn)-sized tensor; the correction runs on (c, bm, bn) in
   fp32 (better numerics than in-loop bf16 dequant: no 128-offset
   cancellation).

3. **Group-aligned plane stacking** — planes reshaped (c, t, bn) and stacked
   on axis=1 gives the (c, group, bn) contraction layout without any sublane
   interleave (Mosaic lowers interleave reshapes catastrophically: 116us+).

Grid is (N/bn, K/bk) with K innermost; each output block is revisited across
K steps with a VMEM fp32 accumulator (the no-atomics TPU replacement for the
reference's split-K atomic_add, gemm_splitK_kernels.py:447-449).

Supported here: packed W in {1,2,4} bits (int32 words), float activations
(compute bf16), W_group_mode 1-4, channel_scale_mode 0-3, scalar or grouped
zeros. Everything else falls back to the general kernel (pallas_gemm.py).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import DType, is_mx_dtype, to_jax_dtype
from ..config import KernelConfig

__all__ = ["pallas_decode_matmul", "can_use_decode_kernel",
           "select_decode_config", "permute_x_for_planes"]

# bf16 exponent-trick constants: (code | MAGIC) bitcast bf16 == OFFSET + code.
# 0x4300: sign 0, exp 134 (2^7=128), mantissa 0 -> 128.0; sub-byte codes land
# in the low mantissa bits exactly (integers < 256 are exact in bf16).
MAGIC16 = 0x43004300
OFFSET = 128.0


def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _halfword_mask(W_nbits: int) -> int:
    m = (1 << W_nbits) - 1
    return m | (m << 16)


def _fp4_planes(w, n_planes, c, t_rows, bn):
    """Unpack fp4-e2m1 codes from int32 words into TRUE bf16 values via pure
    bit remapping (validated): bf16_bits = 0x3F00 + ((c&7)<<6) for normals,
    (c&1)*0x3F00 for subnormals, sign bit3 -> bit15. Two values per op chain
    (16-bit halves)."""
    planes = []
    for j in range(n_planes):
        t = (w >> (4 * j)) & 0x000F000F
        n = t & 0x00070007
        bits = (n << 6) + 0x3F003F00
        f = ((n >> 1) | (n >> 2)) & 0x00010001         # 1 where normal
        mask = (f ^ 0x00010001) * 0xFFFF               # per-half subnormal
        subbits = (n & 0x00010001) * 0x3F00
        bits = (bits & ~mask) | (subbits & mask)
        bits = bits | ((t & 0x00080008) << 12)
        planes.append(pltpu.bitcast(bits, jnp.bfloat16).reshape(c, t_rows, bn))
    return planes


def _fp4x2_planes(w, n_planes, c, t_rows, bn):
    """x2-re-encoded fp4 codes (meta.mx_x2: pack-time nibble remap 0<->1 in
    the em field + e8m0 scale fold E-1, quant.fp4x2_remap_packed): every
    NONZERO code decodes as the bf16 NORMAL (1+m/2)*2^e, e in 0..3, via a
    single field insert — no subnormal cascade. em==1 marks zero (4-op
    mask). 13 VPU ops/pair vs _fp4_planes' 19: the fp4 build is the decode
    bottleneck at M=1 (42us vs int-W4's 13us at 4096^2 in round 4 stage 3),
    so the build op count IS the MXFP4 decode time."""
    planes = []
    for j in range(n_planes):
        t = (w >> (4 * j)) & 0x000F000F
        n = t & 0x00070007
        bits = (n << 6) + 0x3F803F80             # (1+m/2) * 2^e
        d = n ^ 0x00010001                       # 0 iff zero marker
        nz = (d + 0x00070007) & 0x00080008       # bit3 set iff nonzero
        # nz * 0x1FFF = 0xFFF8 per nonzero half; bits' low 3 bits are
        # always clear, so the unshifted product masks exactly
        bits = bits & (nz * 0x1FFF)
        bits = bits | ((t & 0x00080008) << 12)
        planes.append(pltpu.bitcast(bits, jnp.bfloat16).reshape(c, t_rows, bn))
    return planes


def _fp8_planes(w, c, t_rows, bn, e5m2: bool = False, nosub: str = ""):
    """fp8 bit patterns (4 per int32 word) -> TRUE bf16 values via bit remap,
    EXACT over the full finite codebook including subnormals (pinned bit-exact
    vs ml_dtypes in tests/test_kernels.py::test_fp8_codec_exhaustive).

    ``nosub`` (meta.fp8_nosub: a pack-time scan proved E=0/M!=0 codes are
    absent) drops the ~20-op subnormal renormalization cascade — measured
    2.6x faster at the A8W8-FP8 decode headline (scripts/probe_fp8_trick.py:
    250 -> 667 GB/s class). Two variants, both exact on every code the layer
    can contain (zero codes decode exactly; subnormals are excluded by scan):

    - ``"scaled"``: 3 ops/pair, plane = true_value * 2**-(exp_gap) where
      exp_gap = 120 (e4m3) / 112 (e5m2) — the bf16 exponent field is the fp8
      exponent field verbatim, so +-0 codes land on bf16 +-0. The caller MUST
      pre-scale x by 2**(gap/2) and post-scale the accumulator by the other
      half (keeps every product above the f32 flush threshold; flushed-tail
      bound < K * 2**-126 * 2**(gap/2), invisible in bf16/f32 outputs).
    - ``"true"``: 5+3 ops/pair, TRUE values via exponent rebase plus a
      zero-mask (the rebase alone would decode +-0 as 2**(1-bias)); used by
      the prefill kernel where the build cost amortizes over all M rows.

    Normals: e4m3 bits = ((c&0x7F)<<4) + 0x3C00, e5m2 bits =
    ((c&0x7F)<<5) + 0x3800; sign bit7 -> bit15 either way.

    Subnormals (E=0, M!=0) are renormalized with a 2/3-level leading-bit
    cascade in the packed-halfword int domain: e4m3 value = M*2^-9 ->
    {0x3B00, 0x3B80, 0x3BC0, 0x3C00|((M&3)<<5)}, e5m2 value = M*2^-16 ->
    {0x3780, 0x3800|((M&1)<<6)}. All are exactly representable in bf16
    (reference exact-dequant numerics: quant_utils.py:97-123).

    Non-finite codes: e4m3fn S.1111.111 (NaN in ml_dtypes) decodes as
    +-480 (the normal-formula extension); e5m2 E=31 (inf/nan) decodes as
    large finite ~2^16 values. Quantized weights never contain them."""
    if e5m2:
        mant_shift, exp_base, exp_mask, exp_lsb = 5, 0x38003800, 0x007C007C, 2
    else:
        mant_shift, exp_base, exp_mask, exp_lsb = 4, 0x3C003C00, 0x00780078, 3
    planes = []
    for j in range(2):
        t8 = (w >> (8 * j)) & 0x00FF00FF
        me = t8 & 0x007F007F
        if nosub == "scaled":
            # raw exponent copy: +-0 -> bf16 +-0, normals -> v * 2**-gap
            bits = (me << mant_shift) | ((t8 & 0x00800080) << 8)
            planes.append(pltpu.bitcast(bits, jnp.bfloat16)
                          .reshape(c, t_rows, bn))
            continue
        bits = (me << mant_shift) + exp_base
        if nosub == "true":
            # exponent rebase is exact for normals but maps +-0 codes to
            # 2**(1-bias): mask halfwords whose payload (me) is zero to +0.0
            nz = (me + 0x007F007F) & 0x00800080     # bit7 set iff me != 0
            bits = bits & ((nz >> 7) * 0xFFFF)
            bits = bits | ((t8 & 0x00800080) << 8)
            planes.append(pltpu.bitcast(bits, jnp.bfloat16)
                          .reshape(c, t_rows, bn))
            continue
        e = t8 & exp_mask
        f = e >> exp_lsb
        for s in range(exp_lsb + 1, 7):
            f = f | (e >> s)
        f = f & 0x00010001
        fmask = f * 0xFFFF                      # per-half: 0xFFFF where normal
        if e5m2:
            m2 = t8 & 0x00030003
            b1m = ((m2 >> 1) & 0x00010001) * 0xFFFF
            b0m = (m2 & 0x00010001) * 0xFFFF
            sub = ((0x38003800 | ((m2 & 0x00010001) << 6)) & b1m) \
                | (0x37803780 & b0m & ~b1m)
        else:
            m3 = t8 & 0x00070007
            b2m = ((m3 >> 2) & 0x00010001) * 0xFFFF
            b1m = ((m3 >> 1) & 0x00010001) * 0xFFFF
            b0m = (m3 & 0x00010001) * 0xFFFF
            sub = ((0x3C003C00 | ((m3 & 0x00030003) << 5)) & b2m) \
                | ((0x3B803B80 | ((m3 & 0x00010001) << 6)) & b1m & ~b2m) \
                | (0x3B003B00 & b0m & ~b1m & ~b2m)
        bits = (bits & fmask) | (sub & ~fmask)
        bits = bits | ((t8 & 0x00800080) << 8)
        planes.append(pltpu.bitcast(bits, jnp.bfloat16).reshape(c, t_rows, bn))
    return planes


def _w8_planes(w, c, t_rows, bn, as_f32):
    """Packed-W8 BYTE planes as TRUE code values (0..255), 4 full-lane planes
    via the f32 exponent trick: f32_bits = 0x4B000000 | byte -> 2^23 + byte,
    minus 2^23 — exact (byte < 2^23 mantissa). Plane j = byte j of each int32
    word, so the fold order is P=4 (w_layout=2 / permute_x P=4). Replaces the
    bf16 nibble-pair build: measured 42.8 -> 26.8us at 4096^2 gs=K M=1 on
    v5e (scripts/probe_w8.py; streaming floor 25.3us). ``as_f32`` keeps f32
    planes for an f32 raw dot (fastest at tiny M); otherwise the planes
    convert to bf16 (codes <= 255 are bf16-exact: 8-bit significand).
    The returned planes carry NO offset (the raw-dot correction uses 0)."""
    planes = []
    for j in range(4):
        v = pltpu.bitcast(((w >> (8 * j)) & 0xFF) | 0x4B000000,
                          jnp.float32) - 8388608.0
        if not as_f32:
            v = v.astype(jnp.bfloat16)
        planes.append(v.reshape(c, t_rows, bn))
    return planes


def _odd_lo_planes(wlo, bk, bn):
    """1-bit low plane for odd bit-widths (W3/W5): 16 halfword planes built
    on fixed 128-code fold units -> (bk, bn) bf16 values 128 + lo, natural
    k order (the lo codes are pack-time folded with n_planes=16, F=128)."""
    c2 = bk // 128
    planes = [
        pltpu.bitcast(((wlo >> j) & 0x00010001) | MAGIC16,
                      jnp.bfloat16).reshape(c2, 8, bn)
        for j in range(16)
    ]
    return jnp.stack(planes, axis=1).reshape(c2, 128, bn)


def _make_flat_mx_kernel(*, out_jdtype, bm, bn, bk, gs, n_k, n_planes,
                         channel_scale_mode, has_scales_x):
    """MXFP4 flat-dot decode (meta.mx_flat): the e8m0 block scale folds into
    the fp4 planes with ONE broadcast bf16 multiply — exact, since
    fp4_value * 2^(E-127) is a normal bf16 whenever E is in the pack-checked
    range — and the contraction becomes a single (bm, bk) x (bk, bn) MXU dot
    per k-step instead of bk/32 batched 32-deep group dots (the MXU-stalling
    shape behind the 26%-of-roofline round-3 number, BENCH_MATRIX.md:40).
    x ships 2D in natural k order (folded layout) or plane-permuted
    (reference layout); no group reshape on either side."""
    c = bk // gs

    def kernel(*refs):
        x_ref, w_ref, s_ref = refs[0], refs[1], refs[2]
        i = 3
        sx_ref = None
        if has_scales_x:
            sx_ref = refs[i]; i += 1
        o_ref = refs[i]
        acc_ref = refs[i + 1]

        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        planes = _fp4_planes(w_ref[...], n_planes, c, gs // n_planes, bn)
        if c >= s_ref.shape[0]:
            srows = s_ref[...]
        else:
            srows = s_ref[pl.ds(k * c, c), :]
        # e8m0 exponent bits (int32) -> 2^(E-127) as bf16 (exact power of 2)
        s16 = jax.lax.bitcast_convert_type(
            jax.lax.shift_left(srows, 23), jnp.float32
        ).astype(jnp.bfloat16)[:, None, :]                     # (c, 1, bn)
        bg = jnp.stack([p * s16 for p in planes], axis=1).reshape(bk, bn)
        raw = jax.lax.dot_general(
            x_ref[...], bg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (bm, bn)
        acc_ref[...] += raw

        @pl.when(k == n_k - 1)
        def _():
            acc = acc_ref[...]
            if channel_scale_mode == 2 and sx_ref is not None:
                acc = acc * sx_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(out_jdtype)

    return kernel


def _make_kernel(*, W_nbits, W_group_mode, channel_scale_mode, zero_is_scalar,
                 has_scales, has_zeros, has_scales_x,
                 out_jdtype, bm, bn, bk, gs, real_gs, n_k,
                 w_codec=None, scale_codec=None, x_batch_middle=False,
                 odd_lo=False, fp8_nosub=False):
    """gs here is the effective group size clamped to [n_planes, bk];
    real_gs is the layer's group size (used to index the meta strips when a
    k-step covers only part of one group, i.e. bk < real_gs)."""
    # sub-byte codes fit bf16's 7-bit mantissa (v = 128 + code exact);
    # integer 8-bit codes use 4 full-lane BYTE planes via the f32 exponent
    # trick (offset-free TRUE codes — see _w8_planes)
    w8_codes = w_codec is None and W_nbits == 8
    n_planes = 4 if w8_codes else 16 // W_nbits
    mask = _halfword_mask(W_nbits)
    c = bk // gs            # groups per k-step (>= 1)
    t_rows = gs // n_planes  # plane rows per group
    # f32 planes + f32 raw dot win at tiny M (probe: 26.8 vs 28.4us); the
    # f32 MXU rate (~1/8 bf16) makes bf16 planes the right call for bm > 8
    w8_f32 = w8_codes and bm <= 8
    plane_magic, plane_dtype = MAGIC16, jnp.bfloat16
    offset = 0.0 if w8_codes else OFFSET
    # subnormal-free fp8 fast path: raw-exponent planes hold v * 2**-gap;
    # x carries 2**(gap/2) and the epilogue the other half (see _fp8_planes)
    fp8_fast = fp8_nosub and w_codec in ("fp8w", "fp8w5")
    half_scale = 2.0 ** (56 if w_codec == "fp8w5" else 60) if fp8_fast else 1.0

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
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
        acc_ref = refs[i]

        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[...]
        # ---- planes: (c, t, bn) bf16, cheap bit-trick unpack ---------------
        if w_codec in ("fp8w", "fp8w5"):
            planes = _fp8_planes(w, c, t_rows, bn,
                                 e5m2=(w_codec == "fp8w5"),
                                 nosub="scaled" if fp8_fast else "")
        elif w_codec == "fp4":
            planes = _fp4_planes(w, n_planes, c, t_rows, bn)  # TRUE values
        elif w_codec == "fp4x2":
            planes = _fp4x2_planes(w, n_planes, c, t_rows, bn)  # 2x values
        elif w8_codes:
            planes = _w8_planes(w, c, t_rows, bn, w8_f32)     # TRUE codes
        else:
            # integer codes + offset, 3 VPU ops/word
            planes = [
                pltpu.bitcast(((w >> (W_nbits * j)) & mask) | plane_magic,
                              plane_dtype).reshape(c, t_rows, bn)
                for j in range(n_planes)
            ]
        bg = jnp.stack(planes, axis=1).reshape(c, gs, bn)
        if odd_lo:
            # odd bit-width (W3/W5): bg holds 128 + hi; combine with the
            # 1-bit low plane as code = (hi << 1) | lo, keeping the standard
            # +128 offset: (2*(128+hi) - 256) + (128+lo) = 128 + code.
            # ORDER MATTERS: bf16 integers are exact only below 256, so the
            # 256 must come off BEFORE adding the low plane (2*bg is even ->
            # exact; 2*hi + 128 + lo < 256 -> exact).
            vlo = _odd_lo_planes(wlo_ref[...], bk, bn).reshape(c, gs, bn)
            bg = (bg * jnp.bfloat16(2.0) - jnp.bfloat16(256.0)) + vlo

        # ---- raw group dots on the MXU --------------------------------
        # x arrives 3D with gs as a full minor axis (no in-kernel lane-split
        # reshape; ANY group size >= 8*n_planes works):
        #   w_layout=1 (folded): (Mp, G, gs) natural order — a free host-side
        #   reshape; the tiny (bm, c, gs) block is swapped to batch-leading
        #   in-kernel (tpu.matmul needs batch dims in the same position).
        #   w_layout=0: (G, Mp, gs) plane-major, host-permuted + transposed.
        if x_batch_middle:
            xg = jnp.swapaxes(x_ref[...], 0, 1)    # (bm, c, gs) -> (c, bm, gs)
        else:
            xg = x_ref[...]                        # (c, bm, gs)
        if w8_f32:
            xg = xg.astype(jnp.float32)            # f32 raw dot (tiny M)
        if fp8_fast:
            xg = xg * half_scale   # exact power-of-2, stays bf16 (weak f32)
        raw = jax.lax.dot_general(
            xg, bg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (c, bm, bn)
        xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]  # (c, bm, 1)

        # ---- f32 correction: out_g = s*(raw - zoff*xs) [+ fma variant] --
        def meta_rows(ref):
            if c >= ref.shape[0]:
                m = ref[...]
            elif bk < real_gs:
                # k-step inside one group: single row (k*bk)//real_gs
                m = ref[pl.ds((k * bk) // real_gs, 1), :]
            else:
                m = ref[pl.ds(k * c, c), :]
            if scale_codec == "e8m0" and ref is s_ref:
                # exponent bits (shipped as int32) -> 2^(E-127)
                return jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(m, 23), jnp.float32)[:, None, :]
            m = m.astype(jnp.float32)[:, None, :]      # (c, 1, bn)
            if scale_codec == "nvfp4" and ref is s_ref:
                m = m * 0.05                            # NVFP4 meta-scale
            return m

        if W_group_mode == 0:
            # non-quantized true-value codes (A8W8-FP8 post-scale, csm 3):
            # fp8 planes decode exactly, epilogue applies the channel scales
            contrib = raw
        elif W_group_mode == 2 and w_codec in ("fp4", "fp4x2", "fp8w", "fp8w5"):
            # fp4/fp8 planes are true values (x2: doubled values x halved
            # scale): just the block scale, post-dot
            contrib = raw * meta_rows(s_ref)
        elif W_group_mode == 2:
            # symmetric: b = code * s = (v - OFFSET) * s
            s3 = meta_rows(s_ref)
            contrib = (raw - xs * offset) * s3
        elif W_group_mode == 1:
            # shift only: b = code - z
            if zero_is_scalar:
                zoff = z_ref[0, 0].astype(jnp.float32) + offset
            else:
                zoff = meta_rows(z_ref) + offset
            contrib = raw - xs * zoff
        elif W_group_mode == 3:
            # asymmetric: b = (code - z) * s
            s3 = meta_rows(s_ref)
            if zero_is_scalar:
                zoff = z_ref[0, 0].astype(jnp.float32) + offset
            else:
                zoff = meta_rows(z_ref) + offset
            contrib = (raw - xs * zoff) * s3
        elif W_group_mode == 4:
            # fma-packed zeros (z' = -z*s): b = code*s + z'
            s3 = meta_rows(s_ref)
            z3 = meta_rows(z_ref)
            contrib = (raw - xs * offset) * s3 + xs * z3
        else:  # pragma: no cover - guarded by can_use_decode_kernel
            raise NotImplementedError(W_group_mode)

        acc_ref[...] += jnp.sum(contrib, axis=0)

        # ---- channel-scale epilogue on the last K step -----------------
        @pl.when(k == n_k - 1)
        def _():
            acc = acc_ref[...]
            if fp8_fast:
                acc = acc * half_scale   # the other 2**(gap/2) half
            if channel_scale_mode == 1:
                acc = acc * s_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 2:
                acc = acc * sx_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 3:
                acc = acc * sx_ref[...].astype(jnp.float32) \
                          * s_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(out_jdtype)

    return kernel


def permute_x_for_planes(x, W_nbits: int, gs_eff: int, P: int = 0):
    """Reorder K so in-kernel plane stacking matches contraction order.

    Within each effective group: x[:, g*gs + j*t + m] <- x[:, g*gs + P*m + j]
    where P = 16/W_nbits halfword planes (pass P=4 for integer W8 byte
    planes) and t = gs/P rows per plane. Runs in XLA outside the kernel —
    negligible for decode-sized M.
    """
    M, K = x.shape
    P = P or 16 // W_nbits
    t = gs_eff // P
    G = K // gs_eff
    return x.reshape(M, G, t, P).swapaxes(2, 3).reshape(M, K)


def _effective_gs(meta, K: int, bk: int) -> int:
    gs = meta.group_size
    if getattr(meta, "w_layout", 0):
        # folded layout: the fold unit chosen at pack time IS the kernel
        # group unit (core.GemLiteLinear._plane_fold_unit)
        from ..dtypes import is_mx_dtype
        if is_mx_dtype(DType(meta.input_dtype)) and gs == 16:
            return 16  # NVFP4: prefill overrides to the pair-fused 32 build
        if 1 < gs < K:
            return gs
        return 512  # channel-wise fold unit
    if gs <= 1 or gs >= K:
        return bk  # channel-wise / no grouping: one "group" per k-step
    return min(gs, bk)


def fp8_coded(meta) -> bool:
    """True when W_q holds fp8 BIT PATTERNS packed 4-per-int32 (MXFP8 block-
    scaled or plain A8W8-FP8 channel-wise). w_code_dtype != 0 marks fp8 bit
    codes since round 3; pre-existing MXFP8-e4m3 checkpoints stored 0, so MX
    mode-2 W8 layers are also accepted."""
    from ..dtypes import is_mx_dtype
    if meta.W_nbits != 8 or meta.elements_per_sample != 4:
        return False
    if getattr(meta, "w_code_dtype", 0) != 0:
        return True
    return is_mx_dtype(DType(meta.input_dtype)) and meta.W_group_mode == 2


def can_use_decode_kernel(meta, M, N, K, cfg: KernelConfig) -> bool:
    """Constraints for the plane raw-dot decode kernel."""
    from ..dtypes import is_mx_dtype
    input_dtype = DType(meta.input_dtype)
    fp8w = fp8_coded(meta)
    w8_codes = (not is_mx_dtype(input_dtype) and not fp8w
                and meta.W_nbits == 8 and meta.elements_per_sample == 4)
    if meta.W_nbits not in (1, 2, 4) and not (fp8w or w8_codes):
        return False
    if meta.elements_per_sample != 32 // meta.W_nbits:
        return False  # requires int32 packing
    if meta.channel_scale_mode == 4:
        return False
    if fp8w:
        # fp8 planes are TRUE values: raw (mode 0, post-scale) or block-
        # scaled (mode 2) only
        if meta.W_group_mode not in (0, 2):
            return False
    elif meta.W_group_mode not in (1, 2, 3, 4):
        return False
    if is_mx_dtype(input_dtype):
        # MXFP4-coded weights take the fp4 bit-remap plane path, fp8 weights
        # the direct-convert path; dynamic MX activations arrive
        # fake-quantized (csm already rewritten to 0/2)
        if not fp8w and (meta.W_nbits != 4 or meta.W_group_mode != 2):
            return False
    else:
        cj = to_jax_dtype(input_dtype)
        if jnp.dtype(cj).itemsize > 2:
            return False
    # int8/fp8 activations are exact in bf16, so the bf16 MXU path is valid
    # (fp32 accumulation; the reference's int32-exact accumulation is relaxed
    # to bf16-product rounding, within its own test tolerances)
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if not bn or not bk or N % bn or K % bk or bk % 128:
        return False
    n_planes = 4 if w8_codes else 16 // meta.W_nbits
    gs = _effective_gs(meta, K, bk)
    if bk % gs or gs % n_planes:
        return False
    t_rows = gs // n_planes
    if t_rows % 8:
        return False  # sublane-aligned plane reshape
    if getattr(meta, "w_layout", 0):
        # folded x spec is (bm, c, gs): Mosaic requires the 2nd-minor block
        # dim (c = bk // gs) to be 8-divisible or cover the whole G_eff axis
        # (interpret mode does not enforce this — a TPU-only constraint)
        c_blk = bk // gs
        if c_blk % 8 and c_blk != K // gs:
            return False
    if M > cfg.block_m:
        return False  # grid has no M dimension; bm must cover (padded) M
    real_gs = meta.group_size
    if 1 < real_gs < K:
        if bk > real_gs and bk % real_gs:
            return False
        if bk < real_gs and real_gs % bk:
            return False
        G = K // real_gs
        c = bk // gs
        # multi-row meta slices must be 8-aligned (Mosaic sublane rule)
        if 1 < c < G and c % 8:
            return False
    return True


def select_decode_config(meta, M, N, K) -> KernelConfig:
    """Measured-on-v5e defaults (scripts/probe_fold3.py, probe_bench_ab.py):

    At A16W4 gs=128 4096^2 M=1 the top three folded orders — (2048, 1024),
    (1024, 2048), (1024, 4096) — all land at 13.4-15.8us across sessions with
    the tunnel's timing noise; (2048, 1024) has the best interleaved-repeat
    median (~14.0us / ~690 GB/s vs a ~687 GB/s measured streaming ceiling)
    and is the default for both layouts."""
    bm = 8
    while bm < min(M, 64):
        bm *= 2
    folded = bool(getattr(meta, "w_layout", 0))
    # integer W8 stacks f32 byte planes at tiny M: 4 B/value in the plane
    # buffer (probe-validated at bk=4096 x bn=1024 = 16 MB on v5e)
    w8 = (meta.W_nbits == 8 and not fp8_coded(meta)
          and not is_mx_dtype(DType(meta.input_dtype)))
    plane_bytes, plane_budget = (4, 16 * 1024 * 1024) if w8 and bm <= 8 \
        else (2, 12 * 1024 * 1024)
    bn_order = (2048, 1024, 4096, 512, 256, 128)
    bk_order = (1024, 2048, 512, 4096, 256, 128)

    def pick_bk(bn):
        for cand in bk_order:
            if K % cand or cand % 128:
                continue
            gse = _effective_gs(meta, K, cand)
            if cand % gse:
                continue
            if folded:
                # Mosaic folded-x constraint: c = bk//gs must be 8-divisible
                # or cover the whole G_eff axis (can_use_decode_kernel)
                c_blk = cand // gse
                if c_blk % 8 and c_blk != K // gse:
                    continue
            if folded and bn and cand * bn * plane_bytes > plane_budget:
                continue  # bound the stacked-plane VMEM buffer
            return cand
        return 0

    # co-select: large fold units (e.g. channel-wise gs_eff=512 forcing
    # bk=8*gs) may need a narrower bn to fit the VMEM plane bound
    bn = bk = 0
    for bn_cand in bn_order:
        if N % bn_cand:
            continue
        bk_cand = pick_bk(bn_cand)
        if bk_cand:
            bn, bk = bn_cand, bk_cand
            break
        if not bn:
            bn = bn_cand  # remember the widest bn for the no-bk case
    return KernelConfig(block_m=bm, block_n=bn, block_k=bk)


def pallas_decode_matmul(x, W_q, scales, zeros, scales_x, meta,
                         cfg: Optional[KernelConfig] = None,
                         interpret: Optional[bool] = None,
                         W_lo=None):
    """out[M, N] = channel_scale(x @ dequant(W_q)) via the plane raw-dot kernel.

    ``W_lo``: optional 1-bit low plane (K//32, N) int32 for odd bit-widths
    (W3/W5, experimental/odd_bits.py) — meta then describes the HIGH plane
    and the dequantized code is (hi << 1) | lo."""
    M, K = x.shape
    N = meta.out_features
    if cfg is None:
        cfg = select_decode_config(meta, M, N, K)
    if interpret is None:
        interpret = _interpret_mode()

    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    gs = _effective_gs(meta, K, bk)
    n_k = K // bk
    out_jdtype = to_jax_dtype(meta.output_dtype)

    mx_fp8w = fp8_coded(meta)
    folded = bool(getattr(meta, "w_layout", 0))
    # integer W8 uses byte planes (P=4, f32 exponent trick — _w8_planes);
    # everything else contracts halfword planes built by bf16 magic bitcast
    w8_int = (meta.W_nbits == 8 and not mx_fp8w
              and not is_mx_dtype(DType(meta.input_dtype)))
    xq = x.astype(jnp.bfloat16)
    if not folded:
        xq = permute_x_for_planes(xq, meta.W_nbits, gs,
                                  P=4 if w8_int else 0)
    if folded and M == 1:
        bm = Mp = 1  # no M padding: the M=1 hot path is ZERO XLA-side ops
    else:
        Mp = _cdiv(M, bm) * bm
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        if scales_x is not None and meta.channel_scale_mode in (2, 3):
            scales_x = jnp.pad(scales_x, ((0, Mp - M), (0, 0)))
    has_scales = scales is not None and (
        meta.W_group_mode in (2, 3, 4) or meta.channel_scale_mode in (1, 3))
    has_zeros = zeros is not None and meta.W_group_mode in (1, 3, 4)
    has_scales_x = scales_x is not None and meta.channel_scale_mode in (2, 3)

    # MXFP4 flat-dot eligibility (see _make_flat_mx_kernel): scale folded into
    # the planes, ONE flat MXU dot, x stays 2D (no group reshape at all)
    mx_flat = (bool(getattr(meta, "mx_flat", 0))
               and not getattr(meta, "mx_x2", 0)
               and not mx_fp8w and meta.W_nbits == 4
               and is_mx_dtype(DType(meta.input_dtype))
               and meta.W_group_mode == 2
               and has_scales and scales.dtype == jnp.uint8
               and W_lo is None)

    if not mx_flat:
        # 3D view with gs as a full minor axis (any size):
        #   folded:    (Mp, G_eff, gs) — a FREE reshape, natural k order
        #   reference: (G_eff, Mp, gs) — plane-major permuted + transposed
        G_eff = K // gs
        xq = xq.reshape(Mp, G_eff, gs)
        if not folded:
            xq = xq.transpose(1, 0, 2)

    # MX codecs: fp4 weight codes; e8m0 / nvfp4-fp8 scale encodings.
    # e8m0 exponent strips ship as int32 (Mosaic uint8 arithmetic is limited)
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

    c_blk = bk // gs
    if mx_flat:
        # 2D x in natural (folded) / plane-permuted (reference) k order
        x_spec = pl.BlockSpec((bm, bk), lambda j, k: (0, k),
                              memory_space=pltpu.VMEM)
    elif folded:
        x_spec = pl.BlockSpec((bm, c_blk, gs), lambda j, k: (0, k, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((c_blk, bm, gs), lambda j, k: (k, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((bk // meta.elements_per_sample, bn), lambda j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq, W_q]
    if W_lo is not None:
        in_specs.append(pl.BlockSpec((bk // 32, bn), lambda j, k: (k, j),
                                     memory_space=pltpu.VMEM))
        args.append(W_lo)

    if has_scales:
        if meta.channel_scale_mode in (1, 3):
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
    if has_scales_x:
        in_specs.append(pl.BlockSpec((bm, 1), lambda j, k: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales_x.astype(jnp.float32))

    if mx_flat:
        kernel = _make_flat_mx_kernel(
            out_jdtype=out_jdtype, bm=bm, bn=bn, bk=bk, gs=gs, n_k=n_k,
            n_planes=16 // meta.W_nbits,
            channel_scale_mode=meta.channel_scale_mode,
            has_scales_x=has_scales_x,
        )
    else:
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
            n_k=n_k,
            w_codec=w_codec, scale_codec=scale_codec,
            x_batch_middle=folded,
            odd_lo=W_lo is not None,
            fp8_nosub=bool(getattr(meta, "fp8_nosub", 0)),
        )

    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(Mp * K * 2
                        + (K // meta.elements_per_sample) * N * 4
                        + Mp * N * jnp.dtype(out_jdtype).itemsize),
        transcendentals=0,
    )

    out = pl.pallas_call(
        kernel,
        grid=(N // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_jdtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    return out[:M] if Mp != M else out
