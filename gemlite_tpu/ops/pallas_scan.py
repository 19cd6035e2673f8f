# SPDX-License-Identifier: Apache-2.0
"""Layer-stacked decode matmul for scan-over-layers serving models.

Motivation (ROADMAP "engine program compile time"): a 32-layer Llama-8B
serving step unrolls 224 Pallas calls into one HLO, which takes 30-60 min
to compile through this environment's proxied compiler. `lax.scan` over
layers shrinks the HLO ~L-fold, but naively scanning over stacked packed
weights makes XLA materialize a per-layer slice of every weight buffer
per step — at W4 8B that's ~135 MB/layer of pure copy traffic, doubling
the decode step's HBM cost.

This module removes the copy: the SAME plane raw-dot decode kernel
(pallas_decode._make_kernel — one body, both entry points) runs against
the full stacked (L, ...) weight buffers, with the layer index fed as a
scalar-prefetch operand consumed by the BlockSpec index maps. The kernel
then DMAs only layer ``l``'s (bk, bn) blocks straight out of the stacked
HBM buffer — zero XLA-side slicing, identical per-step traffic to the
per-layer kernel. (Same mechanism as the jax-shipped TPU paged-attention
kernel's block-table indexing: pltpu.PrefetchScalarGridSpec.)

Reference framing: the reference's per-layer Triton launches take device
pointers, so "stacked weights + a layer index" is free on CUDA; under
XLA it needs exactly this kernel-side indexing. No reference counterpart
file — this is TPU-native serving infrastructure (the reference
delegates serving to vLLM, reference README.md:171-196).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KernelConfig
from ..dtypes import DType, to_jax_dtype, is_mx_dtype
from .pallas_decode import (
    _cdiv,
    _effective_gs,
    _interpret_mode,
    _make_kernel,
    can_use_decode_kernel,
    fp8_coded,
    permute_x_for_planes,
    select_decode_config,
)

__all__ = ["pallas_decode_matmul_stacked", "can_use_stacked_decode"]


def can_use_stacked_decode(meta, M, N, K, cfg: KernelConfig) -> bool:
    """Stacked eligibility = decode-kernel eligibility minus the variants
    whose operands don't carry a leading layer axis cleanly:

    * mx_flat (scale folded into planes at pack time — per-layer fold
      tables would need stacking logic of their own),
    * zero_is_scalar (SMEM (1, 1) block; Mosaic rejects a squeezed
      leading dim on SMEM operands),
    * odd bit-widths W3/W5 (dual-plane W_lo not plumbed here).
    """
    if not can_use_decode_kernel(meta, M, N, K, cfg):
        return False
    if meta.zero_is_scalar:
        return False
    if getattr(meta, "mx_flat", 0) and not getattr(meta, "mx_x2", 0):
        return False
    return True


def pallas_decode_matmul_stacked(x, W_q, scales, zeros, scales_x, meta,
                                 layer_idx,
                                 cfg: Optional[KernelConfig] = None,
                                 interpret: Optional[bool] = None):
    """out[M, N] for layer ``layer_idx`` of an L-layer stack.

    ``W_q``: (L, K // elements_per_sample, N) int32 — all layers' packed
    weights in one buffer. ``scales`` / ``zeros``: (L, G, N) group strips
    (or (L, 1, N) channel-wise). ``layer_idx``: a TRACED int32 scalar
    (the lax.scan counter). ``x`` / ``scales_x`` are the current layer's
    activations, laid out exactly as for pallas_decode_matmul.

    All layers must share one LayerMeta (same shape, codec, modes) —
    enforced by the caller (models/scan_llama.stack_blocks)."""
    M, K = x.shape
    N = meta.out_features
    if cfg is None:
        cfg = select_decode_config(meta, M, N, K)
    if interpret is None:
        interpret = _interpret_mode()
    if not can_use_stacked_decode(meta, M, N, K, cfg):
        raise NotImplementedError(
            "layer config outside the stacked decode kernel's support")

    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    gs = _effective_gs(meta, K, bk)
    n_k = K // bk
    out_jdtype = to_jax_dtype(meta.output_dtype)

    mx_fp8w = fp8_coded(meta)
    folded = bool(getattr(meta, "w_layout", 0))
    w8_int = (meta.W_nbits == 8 and not mx_fp8w
              and not is_mx_dtype(DType(meta.input_dtype)))
    xq = x.astype(jnp.bfloat16)
    if not folded:
        xq = permute_x_for_planes(xq, meta.W_nbits, gs,
                                  P=4 if w8_int else 0)
    if folded and M == 1:
        bm = Mp = 1
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

    G_eff = K // gs
    xq = xq.reshape(Mp, G_eff, gs)
    if not folded:
        xq = xq.transpose(1, 0, 2)

    w_codec = scale_codec = None
    if mx_fp8w or (is_mx_dtype(DType(meta.input_dtype)) and meta.W_nbits == 4):
        if mx_fp8w:
            w_codec = ("fp8w5" if meta.w_code_dtype == DType.FP8e5.value
                       else "fp8w")
        else:
            w_codec = "fp4x2" if getattr(meta, "mx_x2", 0) else "fp4"
        if has_scales:
            if scales.dtype == jnp.uint8:
                scale_codec = "e8m0"
                scales = scales.astype(jnp.int32)
            elif scales.dtype == jnp.float8_e4m3fn:
                scale_codec = "nvfp4"
                scales = scales.astype(jnp.float32)

    # index maps receive (*grid, scalar_ref); weight/meta blocks squeeze
    # the layer axis with a None block dim, so the shared kernel body sees
    # the same 2-D refs as the per-layer entry point
    c_blk = bk // gs
    if folded:
        x_spec = pl.BlockSpec((bm, c_blk, gs), lambda j, k, l: (0, k, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((c_blk, bm, gs), lambda j, k, l: (k, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((None, bk // meta.elements_per_sample, bn),
                     lambda j, k, l: (l[0], k, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq, W_q]

    if has_scales:
        if meta.channel_scale_mode in (1, 3):
            in_specs.append(pl.BlockSpec((None, 1, bn),
                                         lambda j, k, l: (l[0], 0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales.reshape(-1, 1, N))
        else:
            G = scales.shape[1]
            in_specs.append(pl.BlockSpec((None, G, bn),
                                         lambda j, k, l: (l[0], 0, j),
                                         memory_space=pltpu.VMEM))
            args.append(scales)
    if has_zeros:
        G = zeros.shape[1]
        in_specs.append(pl.BlockSpec((None, G, bn),
                                     lambda j, k, l: (l[0], 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(zeros)
    if has_scales_x:
        in_specs.append(pl.BlockSpec((bm, 1), lambda j, k, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(scales_x.astype(jnp.float32))

    kernel = _make_kernel(
        W_nbits=meta.W_nbits,
        W_group_mode=meta.W_group_mode,
        channel_scale_mode=meta.channel_scale_mode,
        zero_is_scalar=False,
        has_scales=has_scales,
        has_zeros=has_zeros,
        has_scales_x=has_scales_x,
        out_jdtype=out_jdtype,
        bm=bm, bn=bn, bk=bk, gs=gs,
        real_gs=meta.group_size if 1 < meta.group_size < K else bk,
        n_k=n_k,
        w_codec=w_codec, scale_codec=scale_codec,
        x_batch_middle=folded,
        fp8_nosub=bool(getattr(meta, "fp8_nosub", 0)),
    )

    def kernel_wrap(l_ref, *refs):
        del l_ref  # consumed by the index maps only
        kernel(*refs)

    cost = pl.CostEstimate(
        flops=2 * Mp * N * K,
        bytes_accessed=(Mp * K * 2
                        + (K // meta.elements_per_sample) * N * 4
                        + Mp * N * jnp.dtype(out_jdtype).itemsize),
        transcendentals=0,
    )

    out = pl.pallas_call(
        kernel_wrap,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // bn, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda j, k, l: (0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_jdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)

    return out[:M] if Mp != M else out
