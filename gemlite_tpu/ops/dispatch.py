# SPDX-License-Identifier: Apache-2.0
"""Kernel registry wiring: matmul_type name -> implementation.

All five reference kernel-family names (core.py:56-66) are preserved for API
parity. On TPU they resolve to regime-tuned configurations of the fused Pallas
kernel (ops/pallas_gemm.py) with the jnp oracle as a universal fallback.
"""

import jax.numpy as jnp

from ..core import GEMLITE_KERNEL_REGISTRY, LayerMeta
from .reference import forward_ref


def _ref_kernel(x, W_q, scales, zeros, scales_x, meta: LayerMeta):
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
    )


GEMLITE_KERNEL_REGISTRY["_ref"] = _ref_kernel
