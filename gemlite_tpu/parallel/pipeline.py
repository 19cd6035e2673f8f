# SPDX-License-Identifier: Apache-2.0
"""Pipeline parallelism (GPipe-style) over a ``pp`` mesh axis.

Net-new vs the reference (single-GPU, no distribution — SURVEY.md 2.10-bis);
the TPU-native construction: transformer blocks are split into contiguous
stages, each stage's blocks are leaf-stacked and sharded over the ``pp`` axis,
and a shard_map program runs the classic microbatch schedule — every tick each
device applies its stage then ``ppermute``s activations to the next stage over
ICI. n_micro + n_stages - 1 ticks, bubble fraction (S-1)/(T+S-1), all static
shapes (jit/scan friendly).

Embeddings and the LM head stay outside the pipeline (replicated or
tensor-sharded orthogonally); the pipeline moves only the (B, S, H) hidden
state, so tp x pp composes: blocks may hold tensor-sharded quantized linears
along a second mesh axis.
"""

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["stack_stages", "pipeline_apply", "split_stages"]


def split_stages(blocks: Sequence, n_stages: int) -> List[List]:
    """Split a block list into n_stages contiguous, equal-length stages."""
    assert len(blocks) % n_stages == 0, \
        f"{len(blocks)} blocks not divisible into {n_stages} stages"
    per = len(blocks) // n_stages
    return [list(blocks[i * per:(i + 1) * per]) for i in range(n_stages)]


def stack_stages(stages: List[List], mesh: Mesh, axis: str = "pp"):
    """Leaf-stack per-stage block lists into one pytree with a leading stage
    axis sharded over ``axis``: leaf (a, b, ...) -> (n_stages, per_stage, a,
    b, ...). Works for quantized GemLiteLinear leaves (registered pytrees)."""
    per_stage = [
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage)
        for stage in stages
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)

    def shard(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(shard, stacked)


def pipeline_apply(stage_params, block_fn: Callable, x, mesh: Mesh,
                   axis: str = "pp", n_microbatches: int = None):
    """Run x (B, S, H) through all pipeline stages.

    ``stage_params``: output of stack_stages — leaves (n_stages, per_stage,
    ...) sharded over ``axis``. ``block_fn(block, h) -> h`` applies ONE block.
    The batch splits into ``n_microbatches`` (default n_stages) microbatches.
    """
    n_stages = mesh.shape[axis]
    if n_microbatches is None:
        n_microbatches = n_stages
    B = x.shape[0]
    assert B % n_microbatches == 0, (B, n_microbatches)
    mb = B // n_microbatches
    xs = x.reshape(n_microbatches, mb, *x.shape[1:])

    # one tick: apply this device's whole stage to the circulating buffer
    def stage_apply(my_blocks, h):
        per_stage = jax.tree_util.tree_leaves(my_blocks)[0].shape[0]
        for i in range(per_stage):
            blk = jax.tree_util.tree_map(lambda a: a[i], my_blocks)
            h = block_fn(blk, h)
        return h

    other_specs = P(*([None] * x.ndim))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), other_specs),
             out_specs=P(axis), check_vma=False)
    def run(stage_blocks, xs_rep):
        my_blocks = jax.tree_util.tree_map(lambda a: a[0], stage_blocks)
        idx = jax.lax.axis_index(axis)
        T = n_microbatches + n_stages - 1
        buf = jnp.zeros((mb,) + xs_rep.shape[2:], xs_rep.dtype)
        outs = jnp.zeros_like(xs_rep)
        for t in range(T):
            # stage 0 injects microbatch t
            if t < n_microbatches:
                buf = jnp.where(idx == 0, xs_rep[t], buf)
            # keep the carried dtype stable: stage blocks may compute in f32
            y = stage_apply(my_blocks, buf).astype(buf.dtype)
            # last stage completes microbatch t - (n_stages - 1)
            done = t - (n_stages - 1)
            if 0 <= done < n_microbatches:
                outs = outs.at[done].set(
                    jnp.where(idx == n_stages - 1, y, outs[done]).astype(outs.dtype))
            if t < T - 1:
                buf = jax.lax.ppermute(
                    y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
        # each device returns its own outs buffer as one shard of a leading
        # stage axis — only the LAST stage's shard holds real data
        return outs[None]

    # out is (n_stages, n_micro, mb, ...) sharded over the stage axis; the
    # last stage's shard is the result. Slicing it makes XLA move only that
    # one shard (a single owner -> consumers broadcast, volume = |result|) —
    # unlike the previous masked-psum combine, an all-reduce over the FULL
    # buffer on every device (O(stages x |result|) collective volume).
    out = run(stage_params, xs)[n_stages - 1]
    return out.reshape(B, *x.shape[1:])
