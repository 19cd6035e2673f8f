# SPDX-License-Identifier: Apache-2.0
"""Kernel registry wiring: matmul_type name -> implementation.

All five reference kernel-family names (core.py:56-66) are preserved for API
parity. On TPU they resolve to regime-tuned configurations of the fused Pallas
kernel (ops/pallas_gemm.py) with the jnp oracle as a universal fallback for
shapes/modes outside the kernel's constraints.
"""

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


def _ref_kernel(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
    from ..dtypes import is_mx_dtype
    if is_mx_dtype(meta.input_dtype):
        from ..mx import mx_forward_ref
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

        # decode regime: plane raw-dot kernel (fastest measured path)
        if M <= 64:
            dcfg = cfg if cfg is not None else select_decode_config(meta, M, N, K)
            if can_use_decode_kernel(meta, M, N, K, dcfg):
                return pallas_decode_matmul(x, W_q, scales, zeros, scales_x,
                                            meta, dcfg)
            # NVFP4 (gs=16) has no raw-dot decode form (a 16-group batched
            # dot stalls the MXU); the flat-dot prefill kernel covers the
            # small-M regime via M padding with its pair-fused build
            pcfg = cfg if cfg is not None else select_prefill_config(meta, M, N, K)
            if can_use_prefill_kernel(meta, M, N, K, pcfg):
                return pallas_prefill_matmul(x, W_q, scales, zeros, scales_x,
                                             meta, pcfg)
        else:
            # prefill regime: dequant-once cached-block kernel
            pcfg = cfg if cfg is not None else select_prefill_config(meta, M, N, K)
            if can_use_prefill_kernel(meta, M, N, K, pcfg):
                return pallas_prefill_matmul(x, W_q, scales, zeros, scales_x,
                                             meta, pcfg)

        if cfg is None:
            base = select_default_config(meta, M, N, K)
            # family regime caps block_m; never pad M more than ~16x
            bm = 16
            while bm < min(bm_pref, M):
                bm *= 2
            cfg = KernelConfig(block_m=bm, block_n=base.block_n, block_k=base.block_k)
        if can_use_pallas(meta, M, N, K, cfg):
            return pallas_fused_matmul(x, W_q, scales, zeros, scales_x, meta, cfg)
        return _ref_kernel(x, W_q, scales, zeros, scales_x, meta)

    return impl


GEMLITE_KERNEL_REGISTRY["_ref"] = _ref_kernel
for _family in _FAMILY_BM:
    GEMLITE_KERNEL_REGISTRY[_family] = _make_family_kernel(_family)
