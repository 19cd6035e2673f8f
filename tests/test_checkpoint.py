# SPDX-License-Identifier: Apache-2.0
"""Whole-model checkpoint round-trip with quantized layers."""

import numpy as np
import jax.numpy as jnp

from gemlite_tpu.checkpoint import save_model, load_model
from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama, llama_forward


def test_model_roundtrip(tmp_path):
    cfg = LlamaConfig.tiny(vocab_size=64, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=32)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)

    path = str(tmp_path / "model.npz")
    save_model(params, path)
    restored = load_model(path)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    a = llama_forward(params, cfg, tokens)
    b = llama_forward(restored, cfg, tokens)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
