# SPDX-License-Identifier: Apache-2.0
"""MoE with expert parallelism: EP-sharded forward == single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gemlite_tpu.models.moe import (
    MoEConfig, init_moe, quantize_moe, shard_moe, moe_forward,
)


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
