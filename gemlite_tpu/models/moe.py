# SPDX-License-Identifier: Apache-2.0
"""Mixture-of-Experts feed-forward with expert parallelism over an ``ep``
mesh axis, built on quantized GemLite linears.

Net-new vs the reference (linear-layer library, no models). Design:

* Experts are identical SwiGLU MLPs whose (gate, up, down) projections are
  quantized GemLiteLinear pytrees, leaf-stacked on a leading expert axis and
  sharded over ``ep`` — each device owns E/ep experts' packed weights.
* Routing is soft top-k (renormalized) computed from a replicated router.
* Dispatch strategy is *dense*: under shard_map every device evaluates its
  local experts over all tokens, masks by routing weight, and one psum over
  ``ep`` combines — no token dropping, no load-balance cliffs, fully static
  shapes. This trades FLOPs for simplicity and is the right starting point
  on TPU where MXU FLOPs are cheap relative to all_to_all latency at small
  expert counts; a capacity-based all_to_all dispatch can slot in behind the
  same API later.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import GemLiteLinear
from ..autograd import apply_linear
from ..helper import _warmup_quantize

__all__ = ["MoEConfig", "init_moe", "quantize_moe", "shard_moe", "moe_forward"]


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
    g = apply_linear(ex["gate"], x) if isinstance(ex["gate"], GemLiteLinear) \
        else x @ ex["gate"].T.astype(x.dtype)
    u = apply_linear(ex["up"], x) if isinstance(ex["up"], GemLiteLinear) \
        else x @ ex["up"].T.astype(x.dtype)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    return apply_linear(ex["down"], h) if isinstance(ex["down"], GemLiteLinear) \
        else h @ ex["down"].T.astype(h.dtype)


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
             out_specs=P(None, None), check_rep=False)
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
