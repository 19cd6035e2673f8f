# SPDX-License-Identifier: Apache-2.0
"""Pipeline parallelism: GPipe schedule == sequential application (8-dev CPU
mesh), with quantized blocks, composed with data-parallel microbatching."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama
from gemlite_tpu.models.llama import _block_forward
from gemlite_tpu.parallel.pipeline import (
    split_stages, stack_stages, pipeline_apply,
)

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(vocab_size=64, hidden_size=128,
                           intermediate_size=256, num_layers=4, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=32)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)
    return params, cfg


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_matches_sequential(model, pp, n_micro):
    params, cfg = model
    devices = jax.devices()[:pp]
    mesh = Mesh(np.array(devices), ("pp",))

    rng = np.random.default_rng(0)
    B, S = n_micro * 2, 16
    x = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)) * 0.3,
                    jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S)).astype(jnp.int32)

    def block_fn(blk, h):
        pos = jnp.broadcast_to(jnp.arange(S)[None, :],
                               (h.shape[0], S)).astype(jnp.int32)
        out, _ = _block_forward(blk, cfg, h, pos, None, 0, 0)
        return out

    # sequential ground truth
    want = x
    for blk in params["blocks"]:
        want = block_fn(blk, want)

    stages = split_stages(params["blocks"], pp)
    stacked = stack_stages(stages, mesh, "pp")
    got = pipeline_apply(stacked, block_fn, x, mesh, "pp",
                         n_microbatches=n_micro)

    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                              want.astype(jnp.float32))))
    m = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert d / m < 5e-2, (d, m)
