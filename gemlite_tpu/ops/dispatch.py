# SPDX-License-Identifier: Apache-2.0
"""Kernel registry wiring: matmul_type name -> implementation.

All five reference kernel-family names (core.py:56-66) are preserved for API
parity. On TPU they resolve to regime-tuned configurations of the fused Pallas
kernel (ops/pallas_gemm.py) with the jnp oracle as a universal fallback for
shapes/modes outside the kernel's constraints.
"""

import jax
import jax.numpy as jnp

from ..core import GEMLITE_KERNEL_REGISTRY, LayerMeta
from ..config import (KernelConfig, config_signature, ensure_default_config,
                      lookup_config)
from ..dtypes import DType
from ..utils import m_bucket
from .reference import forward_ref
from .pallas_gemm import pallas_fused_matmul, select_default_config, can_use_pallas
from .pallas_decode import (
    pallas_decode_matmul,
    select_decode_config,
    can_use_decode_kernel,
)
from .pallas_prefill import (
    pallas_prefill_matmul,
    select_prefill_config,
    can_use_prefill_kernel,
)
from .pallas_int8 import (
    pallas_int8_decode,
    select_int8_decode_config,
    can_use_int8_decode,
)


# Trace-time log of the kernel that actually served each dispatch (appended
# on every non-jitted call / once per jit trace). Enables TPUCHECK and the
# dispatch-coverage test to pin the REAL routing instead of a predictive
# mirror that can drift from the code it mirrors.
KERNEL_TRACE: list = []


def _note(name: str) -> None:
    if len(KERNEL_TRACE) < 4096:  # bounded; callers clear() around use
        KERNEL_TRACE.append(name)


def last_kernel() -> str:
    return KERNEL_TRACE[-1] if KERNEL_TRACE else ""


def _ref_kernel(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
    from ..dtypes import is_mx_dtype, to_jax_dtype
    if is_mx_dtype(meta.input_dtype):
        from ..mx import mx_forward_ref
        if meta.channel_scale_mode == 4:
            # csm-4 x arrives raw since the dispatch layer owns activation
            # quantization; the oracle contract wants it fake-quantized
            from ..mx import fake_quant_activations
            x = fake_quant_activations(x, DType(meta.input_dtype),
                                       to_jax_dtype(meta.output_dtype))
            meta = meta._replace(channel_scale_mode=0)
        return mx_forward_ref(x, W_q, scales, zeros, scales_x, meta)
    return forward_ref(
        x, W_q, scales, zeros, scales_x,
        W_nbits=meta.W_nbits,
        group_size=meta.group_size,
        elements_per_sample=meta.elements_per_sample,
        W_group_mode=meta.W_group_mode,
        channel_scale_mode=meta.channel_scale_mode,
        input_dtype=meta.input_dtype,
        output_dtype=meta.output_dtype,
        acc_dtype=meta.acc_dtype,
        meta_dtype=meta.meta_dtype,
        zero_is_scalar=bool(meta.zero_is_scalar),
        w_layout=getattr(meta, "w_layout", 0),
        w_code_dtype=getattr(meta, "w_code_dtype", 0),
    )


def autotune_type_id(meta: LayerMeta) -> int:
    """Autotune signature type id: input_dtype*100 + W_nbits, with BF16 aliased
    to FP16 (reference core.py:141-145) so both share cached configs."""
    d = meta.input_dtype
    if d == DType.BF16.value:
        d = DType.FP16.value
    if d == DType.MXBF16.value:
        d = DType.MXFP16.value
    return d * 100 + meta.W_nbits


def _dense_fallback_matmul(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
    """Giant-M prefill: one-pass dequant to dense bf16 + full-rate MXU dot.

    The dequant pass is the Pallas streaming kernel (pallas_dequantize, the
    prefill kernel's block build written out) when the layer qualifies, else
    the fused-XLA dequantize_full; both fold the channel-wise weight scales
    (csm 1/3) into the dense matrix; per-token scales (csm 2/3) apply after."""
    from ..autograd import dequantize_full
    from ..dtypes import to_jax_dtype
    from .pallas_prefill import can_use_dequantize, pallas_dequantize

    N, K = meta.out_features, meta.in_features
    if can_use_dequantize(meta, N, K):
        b = pallas_dequantize(W_q, scales, zeros, meta)                # (K, N)
    else:
        b = dequantize_full(W_q, scales, zeros, meta, dtype=jnp.bfloat16)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if meta.channel_scale_mode in (2, 3) and scales_x is not None:
        acc = acc * scales_x.reshape(-1, 1).astype(jnp.float32)
    return acc.astype(to_jax_dtype(DType(meta.output_dtype)))


# Per-family block_m preference: the regime the family name stands for.
_FAMILY_BM = {
    "GEMV": 16,
    "GEMV_REVSPLITK": 16,
    "GEMV_SPLITK": 16,
    "GEMM_SPLITK": 64,
    "GEMM": 256,
}


def _make_family_kernel(family: str):
    bm_pref = _FAMILY_BM[family]

    def impl(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
        ensure_default_config()
        M = x.shape[0]
        N, K = meta.out_features, meta.in_features
        sig = config_signature(
            m_bucket.get_closest_m(M), N, K, meta.group_size,
            meta.elements_per_sample, autotune_type_id(meta),
        )
        cfg = lookup_config(family, sig)

        if meta.channel_scale_mode == 4:
            from ..dtypes import is_mx_dtype, to_jax_dtype
            if is_mx_dtype(meta.input_dtype) and 64 < M < 4096:
                # micro-scaled activations IN-KERNEL (reference
                # gemm_kernels.py:519-524): stream 1-byte fp8 codes + f32
                # group scales instead of 2-byte fake-quantized activations
                pcfg = cfg if cfg is not None else select_prefill_config(meta, M, N, K)
                if can_use_prefill_kernel(meta, M, N, K, pcfg, mx_x=True):
                    from ..quant import scale_activations_mx_transposed
                    x_mx = scale_activations_mx_transposed(
                        x, DType(meta.input_dtype))
                    _note("prefill_mx_csm4")
                    return pallas_prefill_matmul(None, W_q, scales, zeros,
                                                 None, meta, pcfg, x_mx=x_mx)
            # exact fallback: bf16 fake-quant outside the kernel (bit-
            # identical values — see scale_activations_mx_transposed)
            from ..mx import fake_quant_activations
            x = fake_quant_activations(x, DType(meta.input_dtype),
                                       to_jax_dtype(meta.output_dtype))
            meta = meta._replace(channel_scale_mode=0)

        # decode regime: plane raw-dot kernel (fastest measured path)
        if M <= 64:
            # INT8 activations: exact int8xint8->int32 accumulation first
            # (reference parity: the INT kernels accumulate int32 exactly)
            if DType(meta.input_dtype) == DType.INT8:
                icfg = cfg if cfg is not None else select_int8_decode_config(meta, M, N, K)
                if not can_use_int8_decode(meta, M, N, K, icfg):
                    # a table entry tuned for the bf16 kernels must not knock
                    # out the exact path — retry with the int8 selector
                    icfg = select_int8_decode_config(meta, M, N, K)
                if can_use_int8_decode(meta, M, N, K, icfg):
                    _note("int8_exact")
                    return pallas_int8_decode(x, W_q, scales, zeros, scales_x,
                                              meta, icfg)
            dcfg = cfg if cfg is not None else select_decode_config(meta, M, N, K)
            if can_use_decode_kernel(meta, M, N, K, dcfg):
                _note("decode_plane")
                return pallas_decode_matmul(x, W_q, scales, zeros, scales_x,
                                            meta, dcfg)
            # NVFP4 (gs=16) has no raw-dot decode form (a 16-group batched
            # dot stalls the MXU); the flat-dot prefill kernel covers the
            # small-M regime via M padding with its pair-fused build
            pcfg = cfg if cfg is not None else select_prefill_config(meta, M, N, K)
            if can_use_prefill_kernel(meta, M, N, K, pcfg):
                _note("prefill")
                return pallas_prefill_matmul(x, W_q, scales, zeros, scales_x,
                                             meta, pcfg)
        elif M >= 4096:
            # compute-bound giant-M regime: default is one fused XLA dequant
            # pass to a dense bf16 matrix then the full-rate dense MXU matmul
            # — measured faster than chunked Pallas beyond M ~= 4096. A tuned
            # table entry can override with a fused config the autotuner
            # measured faster than the fallback pseudo-candidate.
            if (cfg is not None and not cfg.route
                    and can_use_prefill_kernel(meta, M, N, K, cfg)):
                _note("prefill")
                return pallas_prefill_matmul(x, W_q, scales, zeros, scales_x,
                                             meta, cfg)
            _note("dense_fallback")
            return _dense_fallback_matmul(x, W_q, scales, zeros, scales_x, meta)
        elif cfg is not None and cfg.route == "fallback":
            # the autotuner measured the two-pass dense route faster than
            # every fused candidate at this signature
            _note("dense_fallback")
            return _dense_fallback_matmul(x, W_q, scales, zeros, scales_x, meta)
        else:
            # prefill regime: dequant-once cached-block kernel
            pcfg = cfg if cfg is not None else select_prefill_config(meta, M, N, K)
            if can_use_prefill_kernel(meta, M, N, K, pcfg):
                _note("prefill")
                return pallas_prefill_matmul(x, W_q, scales, zeros, scales_x,
                                             meta, pcfg)
            # very large M: the full-M accumulator / resident x block exceeds
            # VMEM — run the kernel over static row chunks instead
            for C in (4096, 2048, 1024):
                if M <= C:
                    continue
                ccfg = cfg if cfg is not None else select_prefill_config(meta, C, N, K)
                if can_use_prefill_kernel(meta, C, N, K, ccfg):
                    _note("prefill_chunked")
                    outs = []
                    for i in range(0, M, C):
                        sx_c = None if scales_x is None else scales_x[i:i + C]
                        outs.append(pallas_prefill_matmul(
                            x[i:i + C], W_q, scales, zeros, sx_c, meta, ccfg))
                    return jnp.concatenate(outs, axis=0)

        if cfg is None:
            base = select_default_config(meta, M, N, K)
            # family regime caps block_m; never pad M more than ~16x
            bm = 16
            while bm < min(bm_pref, M):
                bm *= 2
            cfg = KernelConfig(block_m=bm, block_n=base.block_n, block_k=base.block_k)
        if can_use_pallas(meta, M, N, K, cfg):
            _note("general_fused")
            return pallas_fused_matmul(x, W_q, scales, zeros, scales_x, meta, cfg)
        _note("oracle")
        return _ref_kernel(x, W_q, scales, zeros, scales_x, meta)

    return impl


GEMLITE_KERNEL_REGISTRY["_ref"] = _ref_kernel
for _family in _FAMILY_BM:
    GEMLITE_KERNEL_REGISTRY[_family] = _make_family_kernel(_family)
