# SPDX-License-Identifier: Apache-2.0
"""MoE with expert parallelism: EP-sharded forward == single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gemlite_tpu.models.moe import (
    MoEConfig, init_moe, quantize_moe, shard_moe, moe_forward,
    moe_forward_a2a,
)

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')


@pytest.mark.parametrize("ep,top_k", [(2, 2), (4, 1), (8, 2)])
def test_ep_matches_single_device(ep, top_k):
    cfg = MoEConfig(hidden_size=128, expert_size=256, num_experts=8,
                    top_k=top_k)
    params = quantize_moe(init_moe(cfg, seed=0), W_nbits=4, group_size=32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, cfg.hidden_size)) * 0.3, jnp.bfloat16)

    want = moe_forward(params, cfg, x)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    sharded = shard_moe(params, mesh, "ep")
    got = moe_forward(sharded, cfg, x, mesh=mesh, axis="ep")

    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                              want.astype(jnp.float32))))
    m = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert d / m < 5e-2, (d, m)


@pytest.mark.parametrize("ep,top_k", [(2, 2), (4, 1), (8, 2)])
def test_a2a_matches_dense(ep, top_k):
    """With ample capacity (no drops) the all_to_all dispatch must match the
    dense psum-combine oracle."""
    cfg = MoEConfig(hidden_size=128, expert_size=256, num_experts=8,
                    top_k=top_k)
    params = quantize_moe(init_moe(cfg, seed=0), W_nbits=4, group_size=32)

    rng = np.random.default_rng(1)
    T = 64
    x = jnp.asarray(rng.normal(size=(T, cfg.hidden_size)) * 0.3, jnp.bfloat16)

    want = moe_forward(params, cfg, x)

    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    sharded = shard_moe(params, mesh, "ep")
    # capacity C >= T_loc*top_k covers the worst routing: nothing dropped
    got = moe_forward_a2a(sharded, cfg, x, mesh=mesh, axis="ep",
                          capacity_factor=float(cfg.num_experts))

    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                              want.astype(jnp.float32))))
    m = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert d / m < 5e-2, (d, m)


def test_a2a_capacity_drops_are_bounded():
    """With a tight capacity factor the sparse path drops the lowest-priority
    over-capacity tokens but stays close to the oracle on average."""
    cfg = MoEConfig(hidden_size=128, expert_size=256, num_experts=4, top_k=1)
    params = quantize_moe(init_moe(cfg, seed=0), W_nbits=4, group_size=32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, cfg.hidden_size)) * 0.3, jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ep",))
    sharded = shard_moe(params, mesh, "ep")
    want = moe_forward(params, cfg, x)
    got = moe_forward_a2a(sharded, cfg, x, mesh=mesh, axis="ep",
                          capacity_factor=1.5)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    # most rows identical; dropped rows are zero
    row_ok = np.mean(np.max(np.abs(w - g), axis=1) < 5e-2 * np.mean(np.abs(w)))
    assert row_ok > 0.6, row_ok
