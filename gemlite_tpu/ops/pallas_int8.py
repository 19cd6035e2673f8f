# SPDX-License-Identifier: Apache-2.0
"""Exact int8 decode kernel: int8 x int8 -> int32 MXU accumulation.

The reference's INT kernels accumulate int8 products in int32 exactly
(gemm_splitK_kernels.py:278-450); the bf16 plane kernels relax that to
bf16-product/f32-sum rounding. This kernel restores exactness for
INT8-activation layers on the M <= 64 fast path:

* non-packed int8 weights (A8W8 symmetric, W_group_mode 0 / csm 3): the
  weight block IS the int8 operand — one flat int8 dot per k step.
* packed W8 codes (asymmetric, scalar/channel-wise zeros): bytes of the
  int32 words are already in natural k order (little-endian), so
  ``bitcast(w ^ 0x80808080, int8)`` yields (code - 128) int8 lanes in one
  VPU op; the correction adds (128 - z) * xsum back in int32.
* packed W8 codes with GROUPED scales/zeros: same byte bitcast, but the
  k block is walked as ``c = bk // gs`` statically-unrolled flat 2D dots
  (one per group) with the per-group correction and f32 scale applied at
  each step — the batched (c, gs) u8 group-dot form miscompiles Mosaic.
* packed W4/W2 codes channel-wise (BitNet W2 scalar-zero shift, channel-wise
  W4 with strip zeros; W_group_mode 1): byte-planes stacked per k-block
  (unit = bk, the ``cw`` path), meta strips indexed at row 0, int32
  accumulation end-to-end (no in-loop float scale).
* packed W4/W2 codes with grouped int zeros (W_group_mode 3, fma_mode=False):
  even/odd nibble BYTE-planes — ``(w >> p*W_nbits) & 0x0F0F0F0F`` bitcast to
  int8 — stacked per group; the group dot runs batched (c, gs) x (c, gs, bn)
  in int8 with int32 accumulation, and the per-group correction
  ``(raw + (0 - z_g) * xsum_g) * s_g`` applies the float scale AFTER the
  exact integer part. Requires the reference (w_layout=0) packing; x is
  permuted host-side by the byte-plane order (P = 8 / W_nbits), the int8
  analogue of permute_x_for_planes.

Modes 1/3 require INTEGER zeros (pack() enforces this for INT8 inputs);
mode 4 (float fma zeros) stays on the bf16 kernels — pack with
``fma_mode=False`` for the exact path.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import DType, is_mx_dtype, to_jax_dtype
from ..config import KernelConfig
from .pallas_decode import _cdiv, _interpret_mode

__all__ = ["pallas_int8_decode", "can_use_int8_decode",
           "select_int8_decode_config"]

_XOR8 = -2139062144  # 0x80808080 as int32: flips each byte's top bit

_NIB_MASK = {4: 0x0F0F0F0F, 2: 0x03030303}


def _w_kind(meta):
    if meta.elements_per_sample == 1 and meta.W_nbits == 8:
        return "i8_dense"
    if meta.elements_per_sample == 4 and meta.W_nbits == 8:
        return "u8_packed"
    if meta.W_nbits in (2, 4) and meta.elements_per_sample == 32 // meta.W_nbits:
        return "nibble"
    return None


def _gs_eff(meta, K):
    gs = meta.group_size
    return gs if 1 < gs < K else 0   # 0 = no grouping (flat path)


def can_use_int8_decode(meta, M, N, K, cfg: KernelConfig) -> bool:
    if DType(meta.input_dtype) != DType.INT8 or is_mx_dtype(DType(meta.input_dtype)):
        return False
    if getattr(meta, "w_layout", 0):
        return False  # requires reference packing order
    kind = _w_kind(meta)
    if kind is None:
        return False
    if meta.W_group_mode not in (0, 1, 3) or meta.channel_scale_mode == 4:
        return False
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if not bn or not bk or N % bn or K % bk or bk % 128:
        return False
    if M > max(cfg.block_m, 8):
        return False
    gs = _gs_eff(meta, K)
    if gs:
        if bk % gs:
            return False
        if kind == "u8_packed":
            # grouped W8: statically-unrolled flat per-group dots (the
            # batched u8 group-dot form miscompiles Mosaic)
            if gs % 32 or bk // gs > 16:
                return False
        elif kind == "nibble":
            P = 8 // meta.W_nbits
            t8 = gs // P
            if t8 % 32:
                return False  # int8 sublane tile is 32 rows
            G = K // gs
            c = bk // gs
            if 1 < c < G and c % 8:
                return False
        else:
            return False  # dense-int8 grouped (mode 2) stays on bf16 kernels
    elif kind == "nibble":
        # channel-wise nibble (BitNet W2 / channel-wise W4): byte-planes
        # stacked per k-block (unit = bk), meta strips indexed at row 0
        P = 8 // meta.W_nbits
        if (bk // P) % 32:
            return False  # int8 sublane tile is 32 rows
    return True


def select_int8_decode_config(meta, M, N, K) -> KernelConfig:
    bm = 8
    while bm < min(M, 64):
        bm *= 2
    bn = next((c for c in (2048, 1024, 4096, 512, 256, 128) if N % c == 0), 0)
    gs = _gs_eff(meta, K)
    u8 = _w_kind(meta) == "u8_packed"
    bk = 0
    for cand in (1024, 2048, 512, 4096, 256, 128):
        if K % cand or (gs and cand % gs):
            continue
        if gs and u8 and cand // gs > 8:
            # grouped u8 statically unrolls c flat dots; c=16 compiles for
            # ~30 min on real Mosaic (measured) — the gate accepts tuned
            # entries up to 16, but the default selection caps at 8
            continue
        bk = cand
        break
    return KernelConfig(block_m=bm, block_n=bn, block_k=bk)


def _make_kernel(*, kind, W_nbits, W_group_mode, channel_scale_mode,
                 zero_is_scalar, has_scales, has_zeros, has_scales_x,
                 out_jdtype, bm, bn, bk, gs, n_k, cw=False):
    # cw: channel-wise nibble layer — the byte-plane build uses unit = bk
    # (c == 1), then the FLAT dot/correction branch applies (meta strips are
    # channel-wise, valid for every k block; a batched c=1 matmul trips a
    # Mosaic internal check)
    grouped = gs > 0 and not cw
    P = 8 // W_nbits if kind == "nibble" else 1
    t8 = (gs // P) if gs else 0
    c = (bk // gs) if gs else 1
    off8 = 128 if kind == "u8_packed" else 0
    # int32 accumulation is exact whenever no float scale enters the k-loop;
    # per-group scales (W_group_mode 2/3 with has_scales) force f32 partials
    int_acc = not (has_scales and W_group_mode in (2, 3))

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
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
        if kind == "i8_dense":
            bg = w                                            # (bk, bn) int8
        elif kind == "u8_packed":
            bg = pltpu.bitcast(w ^ jnp.int32(_XOR8), jnp.int8)  # code - 128
        else:  # nibble byte-planes
            planes = [
                pltpu.bitcast((w >> (W_nbits * p)) & _NIB_MASK[W_nbits],
                              jnp.int8).reshape(c, t8, bn)
                for p in range(P)
            ]
            bg = jnp.stack(planes, axis=1).reshape(c, gs, bn)
            if cw:
                bg = bg.reshape(gs, bn)   # c == 1: flat-branch operand

        if grouped and kind == "u8_packed":
            # flat per-group dots, statically unrolled over the c groups of
            # this k block (the batched (c, gs) u8 form miscompiles Mosaic);
            # each group's int part is complete before its f32 scale
            x3 = x_ref[...]                                   # (bm, c, gs)
            total = None
            for g in range(c):
                xg = x3[:, g, :]                              # (bm, gs)
                wg = bg[g * gs:(g + 1) * gs, :]               # (gs, bn) int8
                raw = jax.lax.dot_general(
                    xg, wg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)         # (bm, bn)
                xs = jnp.sum(xg.astype(jnp.int32), axis=1)[:, None]
                if has_zeros:
                    if zero_is_scalar:
                        zg = z_ref[0, 0]
                    else:
                        zrow = 0 if cw else k * c + g
                        zg = z_ref[pl.ds(zrow, 1), :].astype(jnp.int32)
                    raw = raw + (off8 - zg) * xs
                else:
                    raw = raw + off8 * xs
                if has_scales and W_group_mode in (2, 3):
                    srow = 0 if cw else k * c + g
                    sg = s_ref[pl.ds(srow, 1), :].astype(jnp.float32)
                    contrib = raw.astype(jnp.float32) * sg
                else:
                    contrib = raw if int_acc else raw.astype(jnp.float32)
                total = contrib if total is None else total + contrib
            acc_ref[...] += total.astype(acc_ref.dtype)
        elif grouped:
            xg = jnp.swapaxes(x_ref[...], 0, 1)               # (c, bm, gs)
            raw = jax.lax.dot_general(
                xg, bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)             # (c, bm, bn)
            xs = jnp.sum(xg.astype(jnp.int32), axis=2)[:, :, None]
            s3 = z3 = None
            if has_zeros:
                if zero_is_scalar:
                    z3 = z_ref[0, 0]
                else:
                    zrow = 0 if cw else k * c
                    z3 = z_ref[pl.ds(zrow, c), :].astype(jnp.int32)[:, None, :]
            corr = raw if not has_zeros else raw + (off8 - z3) * xs
            if has_scales and W_group_mode in (2, 3):
                srow = 0 if cw else k * c
                s3 = s_ref[pl.ds(srow, c), :].astype(jnp.float32)[:, None, :]
                contrib = corr.astype(jnp.float32) * s3
            else:
                contrib = corr if int_acc else corr.astype(jnp.float32)
            acc_ref[...] += jnp.sum(contrib, axis=0).astype(acc_ref.dtype)
        else:
            xg = x_ref[...]                                   # (bm, bk) int8
            raw = jax.lax.dot_general(
                xg, bg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)             # (bm, bn)
            if has_zeros or off8:
                xs = jnp.sum(xg.astype(jnp.int32), axis=1)[:, None]
                if has_zeros:
                    z = (z_ref[0, 0] if zero_is_scalar
                         else z_ref[...].astype(jnp.int32))   # (1, bn) or scalar
                else:
                    z = 0
                raw = raw + (off8 - z) * xs
            if has_scales and W_group_mode == 3:
                # channel-wise scales inside mode 3: still exact — the int
                # part is complete before the f32 multiply
                raw = raw.astype(jnp.float32) * s_ref[...].astype(jnp.float32)
            acc_ref[...] += raw.astype(acc_ref.dtype)

        @pl.when(k == n_k - 1)
        def _():
            acc = acc_ref[...].astype(jnp.float32)
            if channel_scale_mode == 1:
                acc = acc * s_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 2:
                acc = acc * sx_ref[...].astype(jnp.float32)
            elif channel_scale_mode == 3:
                acc = acc * sx_ref[...].astype(jnp.float32) \
                          * s_ref[...].astype(jnp.float32)
            o_ref[...] = acc.astype(out_jdtype)

    return kernel


def _permute_x_bytes(x, W_nbits: int, gs: int):
    """int8 byte-plane order: slot u = p*t8 + r8 holds k = P*r8 + p within
    each group (P = 8 // W_nbits) — the int8 analogue of
    permute_x_for_planes."""
    M, K = x.shape
    P = 8 // W_nbits
    if P <= 1:
        return x
    t = gs // P
    G = K // gs
    return x.reshape(M, G, t, P).swapaxes(2, 3).reshape(M, K)


def pallas_int8_decode(x, W_q, scales, zeros, scales_x, meta,
                       cfg: Optional[KernelConfig] = None,
                       interpret: Optional[bool] = None):
    """out[M, N] = csm(x_i8 @ dequant_int(W)) with exact int32 accumulation."""
    M, K = x.shape
    N = meta.out_features
    if cfg is None:
        cfg = select_int8_decode_config(meta, M, N, K)
    if interpret is None:
        interpret = _interpret_mode()
    kind = _w_kind(meta)
    gs = _gs_eff(meta, K)
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    n_k = K // bk
    out_jdtype = to_jax_dtype(meta.output_dtype)

    # channel-wise nibble layers (BitNet W2, channel-wise W4) run through the
    # grouped plane machinery with unit = bk; meta strips index at row 0
    cw = kind == "nibble" and not gs
    if cw:
        gs = bk

    xq = x.astype(jnp.int8)
    if kind == "nibble":
        xq = _permute_x_bytes(xq, meta.W_nbits, gs)
    Mp = _cdiv(M, bm) * bm
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        if scales_x is not None and meta.channel_scale_mode in (2, 3):
            scales_x = jnp.pad(scales_x, ((0, Mp - M), (0, 0)))

    has_scales = scales is not None and (
        meta.W_group_mode in (2, 3) or meta.channel_scale_mode in (1, 3))
    has_zeros = zeros is not None and meta.W_group_mode in (1, 3)
    has_scales_x = scales_x is not None and meta.channel_scale_mode in (2, 3)

    in_specs = []
    args = []
    if gs and not cw:
        G_eff = K // gs
        xq = xq.reshape(Mp, G_eff, gs)
        in_specs.append(pl.BlockSpec((bm, bk // gs, gs), lambda j, k: (0, k, 0),
                                     memory_space=pltpu.VMEM))
    else:
        # flat (bm, bk) block — also used by cw (unit = bk; a (bm, 1, gs)
        # spec would violate Mosaic's 8-sublane block rule)
        in_specs.append(pl.BlockSpec((bm, bk), lambda j, k: (0, k),
                                     memory_space=pltpu.VMEM))
    args.append(xq)

    w_rows = K // meta.elements_per_sample
    in_specs.append(pl.BlockSpec((bk // meta.elements_per_sample, bn),
                                 lambda j, k: (k, j), memory_space=pltpu.VMEM))
    args.append(W_q)

    if has_scales:
        if meta.channel_scale_mode in (1, 3) or scales.shape[0] == 1:
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
            args.append(zeros.reshape(1, 1).astype(jnp.int32))
        elif zeros.shape[0] == 1 or not gs:
            in_specs.append(pl.BlockSpec((1, bn), lambda j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(zeros.reshape(1, N))
        else:
            G = zeros.shape[0]
            in_specs.append(pl.BlockSpec((G, bn), lambda j, k: (0, j),
                                         memory_space=pltpu.VMEM))
            args.append(zeros)
    if has_scales_x:
        in_specs.append(pl.BlockSpec((bm, 1), lambda j, k: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales_x.astype(jnp.float32))

    int_acc = not (has_scales and meta.W_group_mode in (2, 3))
    kernel = _make_kernel(
        kind=kind, W_nbits=meta.W_nbits,
        W_group_mode=meta.W_group_mode,
        channel_scale_mode=meta.channel_scale_mode,
        zero_is_scalar=bool(meta.zero_is_scalar),
        has_scales=has_scales, has_zeros=has_zeros,
        has_scales_x=has_scales_x,
        out_jdtype=out_jdtype,
        bm=bm, bn=bn, bk=bk, gs=gs, n_k=n_k, cw=cw,
    )

    out = pl.pallas_call(
        kernel,
        grid=(N // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_jdtype),
        scratch_shapes=[pltpu.VMEM((bm, bn),
                                   jnp.int32 if int_acc else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    return out[:M] if Mp != M else out
