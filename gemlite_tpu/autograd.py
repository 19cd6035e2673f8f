# SPDX-License-Identifier: Apache-2.0
"""Differentiable quantized matmul (straight-through estimator).

The reference is inference-only; here the fused forward gets a custom VJP so
quantized layers can sit inside trained models (QLoRA-style: frozen packed
weights, gradients flow to activations / adapters / norms):

    dx = g @ dequant(W)           (dense MXU matmul against dequantized W)
    dW_q, dscales, dzeros = 0     (packed integer buffers are not trainable)

Dynamic activation quantization inside the forward is treated as identity for
the backward pass (straight-through)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core import forward_functional, LayerMeta
from .dtypes import DType, is_mx_dtype, to_jax_dtype


def dequantize_full(W_q, scales, zeros, meta: LayerMeta, dtype=jnp.bfloat16):
    """Packed layer state -> dense (K, N) weight matrix."""
    if is_mx_dtype(meta.input_dtype):
        from .mx import mx_dequantize_weight_ref
        return mx_dequantize_weight_ref(W_q, scales, meta).astype(dtype)
    from .ops.reference import unpack_rows_ref, dequantize_ref
    b = unpack_rows_ref(W_q, meta.W_nbits, meta.elements_per_sample, meta.in_features,
                        w_layout=getattr(meta, "w_layout", 0),
                        group_size=meta.group_size, input_dtype=meta.input_dtype)
    b = dequantize_ref(
        b, scales if meta.W_group_mode in (2, 3, 4) else None,
        zeros if meta.W_group_mode in (1, 3, 4) else None,
        W_group_mode=meta.W_group_mode,
        meta_dtype=jnp.float32,
        zero_is_scalar=bool(meta.zero_is_scalar),
    ).astype(jnp.float32)
    if meta.channel_scale_mode in (1, 3) and scales is not None:
        b = b * scales.reshape(1, -1).astype(jnp.float32)
    return b.astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def quantized_matmul(x, W_q, scales, zeros, bias, meta: LayerMeta):
    """Differentiable fused forward. x (..., K) -> (..., N)."""
    return forward_functional(x, bias, [W_q, scales, zeros], meta)


def _fwd(x, W_q, scales, zeros, bias, meta):
    out = forward_functional(x, bias, [W_q, scales, zeros], meta)
    return out, (x, W_q, scales, zeros, bias)


def _zero_ct(a):
    if a is None:
        return None
    if jnp.issubdtype(a.dtype, jnp.floating):
        return jnp.zeros_like(a)
    return np.zeros(a.shape, dtype=jax.dtypes.float0)


def _bwd(meta, res, g):
    x, W_q, scales, zeros, bias = res
    W = dequantize_full(W_q, scales, zeros, meta, dtype=jnp.float32)  # (K, N)
    gf = g.astype(jnp.float32)
    dx = jnp.einsum("...n,kn->...k", gf, W).astype(x.dtype)
    dbias = (gf.reshape(-1, gf.shape[-1]).sum(axis=0).astype(bias.dtype)
             if bias is not None else None)
    return (dx, _zero_ct(W_q), _zero_ct(scales), _zero_ct(zeros), dbias)


quantized_matmul.defvjp(_fwd, _bwd)


def apply_linear(layer, x):
    """Differentiable call on a GemLiteLinear / layer pytree."""
    return quantized_matmul(x, layer.W_q, layer.scales, layer.zeros,
                            layer.bias, layer.meta)
