# SPDX-License-Identifier: Apache-2.0
"""Mixture-of-Experts feed-forward with expert parallelism over an ``ep``
mesh axis, built on quantized GemLite linears.

Net-new vs the reference (linear-layer library, no models). Design:

* Experts are identical SwiGLU MLPs whose (gate, up, down) projections are
  quantized GemLiteLinear pytrees, leaf-stacked on a leading expert axis and
  sharded over ``ep`` — each device owns E/ep experts' packed weights.
* Routing is soft top-k (renormalized) computed from a replicated router.
Two dispatch strategies:

* ``moe_forward`` (*dense*, the oracle): under shard_map every device
  evaluates its local experts over all tokens, masks by routing weight, and
  one psum over ``ep`` combines — no token dropping, no load-balance cliffs,
  fully static shapes. Right for small expert counts where MXU FLOPs are
  cheap relative to collective latency, and the correctness reference for
  the sparse path.
* ``moe_forward_a2a`` (*capacity-bucketed all_to_all*, serving-grade):
  tokens are sharded over ``ep``; each shard routes its T_loc tokens,
  buckets them into a static (E, C, H) dispatch buffer (GShard-style
  position-in-expert via cumsum, tokens over capacity dropped), exchanges
  buffers with ``jax.lax.all_to_all`` so each device receives exactly its
  local experts' tokens from every shard, runs the quantized experts on
  (ep*C, H) batches — per-device expert FLOPs scale with ROUTED tokens, not
  all tokens — and a second all_to_all returns the results for the weighted
  combine. All shapes static; capacity_factor trades drop probability for
  padding FLOPs.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..helper import _warmup_quantize

__all__ = ["MoEConfig", "init_moe", "quantize_moe", "shard_moe", "moe_forward",
           "moe_forward_a2a"]


@dataclass(frozen=True)
class MoEConfig:
    hidden_size: int = 256
    expert_size: int = 512
    num_experts: int = 8
    top_k: int = 2
    dtype: object = jnp.bfloat16


def init_moe(cfg: MoEConfig, seed: int = 0):
    rng = np.random.default_rng(seed)

    def mat(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.02, cfg.dtype)

    return {
        "router": mat(cfg.num_experts, cfg.hidden_size),
        "experts": [
            {"gate": mat(cfg.expert_size, cfg.hidden_size),
             "up": mat(cfg.expert_size, cfg.hidden_size),
             "down": mat(cfg.hidden_size, cfg.expert_size)}
            for _ in range(cfg.num_experts)
        ],
    }


def quantize_moe(params, processor=None, W_nbits: int = 4, group_size: int = 64):
    from ..helper import A16Wn_HQQ_INT

    if processor is None:
        processor = A16Wn_HQQ_INT(W_nbits=W_nbits)

    def q(w):
        return _warmup_quantize(processor, np.asarray(w, np.float32), group_size)

    return {
        "router": params["router"],
        "experts": [
            {k: q(v) for k, v in ex.items()} for ex in params["experts"]
        ],
    }


def shard_moe(params, mesh: Mesh, axis: str = "ep"):
    """Leaf-stack experts on a leading axis sharded over ``axis``."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *params["experts"])

    def shard(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1)))))

    return {
        "router": jax.device_put(params["router"], NamedSharding(mesh, P())),
        "experts": jax.tree_util.tree_map(shard, stacked),
    }


def _expert_apply(ex, x):
    from .llama import _apply   # shared dense-or-quantized dispatch

    g = _apply(ex["gate"], x)
    u = _apply(ex["up"], x)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    return _apply(ex["down"], h)


def _routing_weights(router_w, x, num_experts, top_k):
    logits = (x.astype(jnp.float32) @ router_w.T.astype(jnp.float32))
    if top_k >= num_experts:
        return jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(logits, top_k)
    probs = jax.nn.softmax(vals, axis=-1)
    full = jnp.zeros_like(logits)
    return full.at[jnp.arange(x.shape[0])[:, None], idx].set(probs)


def moe_forward(params, cfg: MoEConfig, x, mesh: Optional[Mesh] = None,
                axis: str = "ep"):
    """x (T, H) -> (T, H). With a mesh, experts must be sharded via shard_moe
    and the combine runs as one psum over ``axis``."""
    E = cfg.num_experts

    if mesh is None:
        w = _routing_weights(params["router"], x, E, cfg.top_k)  # (T, E)
        out = jnp.zeros(x.shape, jnp.float32)
        for e, ex in enumerate(params["experts"]):
            out = out + w[:, e:e + 1] * _expert_apply(ex, x).astype(jnp.float32)
        return out.astype(x.dtype)

    experts = params["experts"]          # leaf-stacked (E, ...), sharded
    router_w = params["router"]
    e_local = E // mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(None, None), P(None, None)),
             out_specs=P(None, None), check_vma=False)
    def run(local_experts, router_rep, x_rep):
        base = jax.lax.axis_index(axis) * e_local
        w = _routing_weights(router_rep, x_rep, E, cfg.top_k)
        out = jnp.zeros(x_rep.shape, jnp.float32)
        for i in range(e_local):
            ex = jax.tree_util.tree_map(lambda a: a[i], local_experts)
            wi = jax.lax.dynamic_slice_in_dim(w, base + i, 1, axis=1)
            out = out + wi * _expert_apply(ex, x_rep).astype(jnp.float32)
        return jax.lax.psum(out, axis).astype(x_rep.dtype)

    return run(experts, router_w, x)


def _bucket_tokens(logits, top_k, E, C):
    """GShard-style capacity bucketing (static shapes).

    logits (T, E) -> (flat_e, pos, gate, keep) over the T*top_k flattened
    (token, slot) pairs: expert id, position-in-expert (token-major
    priority), renormalized gate value, and the within-capacity mask."""
    T = logits.shape[0]
    vals, idx = jax.lax.top_k(logits, top_k)               # (T, K)
    gates = jax.nn.softmax(vals, axis=-1)
    flat_e = idx.reshape(-1)                               # (T*K,)
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)    # (T*K, E)
    pos = jnp.cumsum(onehot, axis=0) - 1                   # occurrence index
    pos_in_e = jnp.take_along_axis(pos, flat_e[:, None], axis=1)[:, 0]
    keep = pos_in_e < C
    return flat_e, jnp.minimum(pos_in_e, C - 1), gates.reshape(-1), keep


def moe_forward_a2a(params, cfg: MoEConfig, x, mesh: Mesh, axis: str = "ep",
                    capacity_factor: float = 1.25):
    """Sparse expert-parallel forward: x (T, H) sharded over ``axis`` rows.

    Each shard routes its T/ep tokens into a static (E, C, H) dispatch
    buffer, all_to_all moves expert-major slices so every device holds its
    E/ep experts' tokens from all shards, the quantized experts run on
    (ep*C, H) batches, and the inverse all_to_all returns results for the
    gate-weighted combine. Tokens beyond an expert's capacity
    C = ceil(T_loc*top_k*capacity_factor / E) are dropped (their gate weight
    contributes nothing) — the standard GShard/Switch trade; the dense
    ``moe_forward`` is the no-drop oracle."""
    E = cfg.num_experts
    ep = mesh.shape[axis]
    e_local = E // ep
    T = x.shape[0]
    T_loc = T // ep
    C = int(np.ceil(T_loc * cfg.top_k * capacity_factor / E))
    C = max(8, -(-C // 8) * 8)  # sublane-align the expert batch

    experts = params["experts"]
    router_w = params["router"]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(None, None), P(axis, None)),
             out_specs=P(axis, None), check_vma=False)
    def run(local_experts, router_rep, x_loc):
        x_loc = x_loc.reshape(T_loc, -1)
        H = x_loc.shape[1]
        logits = (x_loc.astype(jnp.float32) @ router_rep.T.astype(jnp.float32))
        flat_e, pos, gate, keep = _bucket_tokens(logits, cfg.top_k, E, C)
        tok = jnp.repeat(jnp.arange(T_loc), cfg.top_k)

        # dispatch buffer (E, C, H): dropped pairs scatter a zero row
        buf = jnp.zeros((E, C, H), x_loc.dtype)
        rows = jnp.where(keep[:, None], x_loc[tok], 0).astype(x_loc.dtype)
        buf = buf.at[flat_e, pos].add(rows)

        # exchange: (E, C, H) -> receive my e_local experts' tokens from
        # every shard: (ep, e_local, C, H) -> (e_local, ep*C, H)
        recv = jax.lax.all_to_all(
            buf.reshape(ep, e_local, C, H), axis, split_axis=0,
            concat_axis=0, tiled=False)                    # (ep, e_local, C, H)
        recv = recv.transpose(1, 0, 2, 3).reshape(e_local, ep * C, H)

        outs = []
        for i in range(e_local):
            ex = jax.tree_util.tree_map(lambda a: a[i], local_experts)
            outs.append(_expert_apply(ex, recv[i]).astype(x_loc.dtype))
        y = jnp.stack(outs)                                # (e_local, ep*C, H)

        # inverse exchange back to token shards: (E, C, H) on each source
        y = y.reshape(e_local, ep, C, H).transpose(1, 0, 2, 3)
        back = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0,
                                  tiled=False)             # (ep, e_local, C, H)
        back = back.reshape(E, C, H)

        # gate-weighted combine
        contrib = back[flat_e, pos].astype(jnp.float32)    # (T_loc*K, H)
        contrib = contrib * (gate * keep)[:, None]
        out = jnp.zeros((T_loc, H), jnp.float32).at[tok].add(contrib)
        return out.astype(x_loc.dtype)

    return run(experts, router_w, x)
