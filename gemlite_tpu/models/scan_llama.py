# SPDX-License-Identifier: Apache-2.0
"""Scan-over-layers Llama decode: O(1)-size HLO in the layer count.

The unrolled serving step (models/llama.py) emits 7 Pallas calls per
layer; at 32 layers the 8B decode program takes 30-60 min to compile
through this environment's proxied compiler (ROADMAP: "engine program
compile time"). This module builds the same decode step as ONE
`lax.scan` over a layer axis:

* every block linear's packed tensors are stacked into (L, ...) buffers
  once at load time (`stack_blocks`);
* inside the scan body the stacked decode kernel
  (ops/pallas_scan.pallas_decode_matmul_stacked) reads layer ``l``'s
  blocks directly out of the stacked HBM buffers via a scalar-prefetch
  index map — the per-layer weight-slice copies that make a naive
  scan-over-stacked-weights 2x the HBM traffic never materialize;
* the KV cache keeps its (L, 2, B, T, Hkv, D) layout; the scan body
  writes layer ``l`` with a scatter and reads it with a dynamic slice
  (the one remaining per-layer slice — KV, not weights).

Semantics match `llama_decode_step_batched` bit-for-bit on the same
kernels (tests/test_scan_llama.py pins equality); the unrolled path
remains the default — scan is for serving programs whose compile time,
not step time, is the binding cost.

No reference counterpart: the reference's per-layer Triton launches
take raw device pointers, so layer indexing is free on CUDA; under
XLA's whole-program compilation it needs exactly this structure.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import GemLiteLinear
from .llama import LlamaConfig, _rms_norm, _rope, _apply, _attention

__all__ = ["stack_blocks", "llama_decode_step_scan"]

_ATTN_KEYS = ("wq", "wk", "wv", "wo", "wqkv")
_MLP_KEYS = ("gate", "up", "down", "gate_up")


class StackedLinear:
    """(L, ...) packed tensors of one linear across all blocks. A
    registered pytree whose META travels as AUX DATA (static under jit,
    like GemLiteLinear's) while the stacked buffers are leaves — so the
    whole stack can be passed as a jit argument."""

    def __init__(self, meta, W_q, scales, zeros, bias):
        self.meta = meta
        self.W_q = W_q
        self.scales = scales
        self.zeros = zeros
        self.bias = bias

    def tree_flatten(self):
        return (self.W_q, self.scales, self.zeros, self.bias), self.meta

    @classmethod
    def tree_unflatten(cls, meta, children):
        return cls(meta, *children)


jax.tree_util.register_pytree_node(
    StackedLinear, StackedLinear.tree_flatten, StackedLinear.tree_unflatten)


def _stack_linears(layers) -> StackedLinear:
    """Stack one named linear across L blocks; all metas must agree."""
    meta0 = layers[0].meta
    for lyr in layers[1:]:
        if tuple(lyr.meta) != tuple(meta0):
            raise ValueError("scan requires identical layer metas across "
                             "blocks (same shape, codec, modes)")
    return StackedLinear(
        meta0,
        jnp.stack([lyr.W_q for lyr in layers]),
        (jnp.stack([lyr.scales for lyr in layers])
         if layers[0].scales is not None else None),
        (jnp.stack([lyr.zeros for lyr in layers])
         if layers[0].zeros is not None else None),
        (jnp.stack([lyr.bias for lyr in layers])
         if layers[0].bias is not None else None),
    )


def stack_blocks(params: Dict) -> Dict[str, Any]:
    """Build the stacked-parameter pytree from a quantized model's blocks.

    Every block linear must be a packed GemLiteLinear with identical meta
    across layers (true for any model quantized by `quantize_llama` with
    one processor). Norm weights stack to (L, H)."""
    blocks = params["blocks"]
    a_keys = [k for k in _ATTN_KEYS if k in blocks[0]["attn"]]
    m_keys = [k for k in _MLP_KEYS if k in blocks[0]["mlp"]]
    for blk in blocks:
        for k in a_keys:
            if not isinstance(blk["attn"][k], GemLiteLinear):
                raise ValueError("stack_blocks requires all-quantized blocks")
        for k in m_keys:
            if not isinstance(blk["mlp"][k], GemLiteLinear):
                raise ValueError("stack_blocks requires all-quantized blocks")
    return {
        "attn": {k: _stack_linears([b["attn"][k] for b in blocks])
                 for k in a_keys},
        "mlp": {k: _stack_linears([b["mlp"][k] for b in blocks])
                for k in m_keys},
        "ln_attn": jnp.stack([b["ln_attn"] for b in blocks]),
        "ln_mlp": jnp.stack([b["ln_mlp"] for b in blocks]),
    }


def _stacked_apply(stk: StackedLinear, x, lidx):
    """x: (B, S, H) -> (B, S, N) through layer ``lidx`` of the stack."""
    from ..ops.pallas_scan import pallas_decode_matmul_stacked

    B, S, H = x.shape
    out = pallas_decode_matmul_stacked(
        x.reshape(B * S, H), stk.W_q, stk.scales, stk.zeros, None,
        stk.meta, lidx)
    if stk.bias is not None:
        out = out + jax.lax.dynamic_index_in_dim(
            stk.bias, lidx, keepdims=False)
    return out.reshape(B, S, -1)


def llama_decode_step_scan(stacked: Dict, params: Dict, cfg: LlamaConfig,
                           token, kv, cache_lens, t_active=None):
    """Continuous-batching decode step as one lax.scan over layers.

    token (B, 1); cache_lens (B,) int32 per-slot offsets; kv the dense
    (L, 2, B, T, Hkv, D) cache. Returns (logits (B, 1, V), kv) — the
    same contract as `llama_decode_step_batched`."""
    B, S = token.shape
    positions = cache_lens[:, None].astype(jnp.int32)
    x = params["embed"][token]
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    bidx = jnp.arange(B)[:, None]
    pos = cache_lens[:, None] + jnp.arange(S)[None, :]

    def body(carry, lidx):
        x, kv = carry
        h = _rms_norm(x, jax.lax.dynamic_index_in_dim(
            stacked["ln_attn"], lidx, keepdims=False), cfg.norm_eps)
        if "wqkv" in stacked["attn"]:
            qkv = _stacked_apply(stacked["attn"]["wqkv"], h, lidx)
            q, k, v = (qkv[..., :QD], qkv[..., QD:QD + KD],
                       qkv[..., QD + KD:])
        else:
            q = _stacked_apply(stacked["attn"]["wq"], h, lidx)
            k = _stacked_apply(stacked["attn"]["wk"], h, lidx)
            v = _stacked_apply(stacked["attn"]["wv"], h, lidx)
        q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
        k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        # per-slot scatter write at layer lidx, then a dynamic-slice read
        # (mirrors llama._block_forward's per-slot dense-cache path with a
        # traced layer index)
        kv = kv.at[lidx, 0, bidx, pos].set(k.astype(kv.dtype))
        kv = kv.at[lidx, 1, bidx, pos].set(v.astype(kv.dtype))
        kvl = jax.lax.dynamic_index_in_dim(kv, lidx, keepdims=False)
        k_all, v_all = kvl[0], kvl[1]
        if t_active is not None and t_active < k_all.shape[1]:
            k_all = k_all[:, :t_active]
            v_all = v_all[:, :t_active]
        T = k_all.shape[1]
        t_idx = jnp.arange(T)[None, None, :]
        s_idx = cache_lens[:, None, None] + jnp.arange(S)[None, :, None]
        mask = jnp.broadcast_to(t_idx <= s_idx, (B, S, T))
        attn = _attention(q, k_all, v_all, mask).reshape(B, S, -1)
        x = x + _stacked_apply(stacked["attn"]["wo"], attn, lidx)

        h = _rms_norm(x, jax.lax.dynamic_index_in_dim(
            stacked["ln_mlp"], lidx, keepdims=False), cfg.norm_eps)
        if "gate_up" in stacked["mlp"]:
            gu = _stacked_apply(stacked["mlp"]["gate_up"], h, lidx)
            I = gu.shape[-1] // 2
            g, u = gu[..., :I], gu[..., I:]
        else:
            g = _stacked_apply(stacked["mlp"]["gate"], h, lidx)
            u = _stacked_apply(stacked["mlp"]["up"], h, lidx)
        h = (jax.nn.silu(g.astype(jnp.float32))
             * u.astype(jnp.float32)).astype(x.dtype)
        x = x + _stacked_apply(stacked["mlp"]["down"], h, lidx)
        return (x, kv), None

    (x, kv), _ = jax.lax.scan(
        body, (x, kv), jnp.arange(cfg.num_layers, dtype=jnp.int32))
    x = _rms_norm(x, params["ln_f"], cfg.norm_eps)
    logits = _apply(params["lm_head"], x)
    return logits, kv
