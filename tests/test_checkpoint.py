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


def test_mldtype_leaves_roundtrip(tmp_path):
    """bf16/fp8 leaves must survive np.savez (which silently degrades
    ml_dtypes to void records without the bit-view markers)."""
    import jax.numpy as jnp
    import numpy as np
    from gemlite_tpu.checkpoint import load_model, save_model

    tree = {
        "w_bf16": jnp.asarray(np.linspace(-2, 2, 64).reshape(8, 8), jnp.bfloat16),
        "w_fp8": jnp.asarray(np.linspace(-2, 2, 64).reshape(8, 8),
                             jnp.float8_e4m3fn),
        "plain": np.arange(6, dtype=np.float32),
    }
    path = str(tmp_path / "mld.npz")
    save_model(tree, path)
    out = load_model(path)
    assert out["w_bf16"].dtype == jnp.bfloat16
    assert out["w_fp8"].dtype == jnp.float8_e4m3fn
    np.testing.assert_array_equal(np.asarray(out["w_bf16"], np.float32),
                                  np.asarray(tree["w_bf16"], np.float32))
    np.testing.assert_array_equal(np.asarray(out["w_fp8"], np.float32),
                                  np.asarray(tree["w_fp8"], np.float32))


def test_quantized_layer_bf16_scales_roundtrip(tmp_path):
    """A packed layer whose scales/zeros are bf16 (the common helper
    output) must round-trip through both save_model and layer.save."""
    import jax.numpy as jnp
    import numpy as np
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.checkpoint import load_model, save_model

    rng = np.random.default_rng(0)
    N, K, gs = 128, 256, 64
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (G, 1)) * 2.0**-8, jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, 1)), jnp.bfloat16)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        codes, scales, zeros)
    x = jnp.asarray(rng.normal(size=(2, K)) * 0.1, jnp.bfloat16)
    want = np.asarray(layer(x), np.float32)

    p1 = str(tmp_path / "tree.npz")
    save_model({"l": layer}, p1)
    l2 = load_model(p1)["l"]
    np.testing.assert_array_equal(np.asarray(l2(x), np.float32), want)

    p2 = str(tmp_path / "layer.npz")
    layer.save(p2)
    l3 = GemLiteLinear.load(p2)
    assert l3.scales.dtype == layer.scales.dtype
    np.testing.assert_array_equal(np.asarray(l3(x), np.float32), want)
