# SPDX-License-Identifier: Apache-2.0
"""Checkpoint importer: HF Llama -> gemlite_tpu, validated against the real
``transformers`` torch implementation (logit parity), plus the quantize flow.

This is the loader the real-model end-to-end validation rides on
(reference end-to-end flow: helper.py:34-85 patch_model + README.md:14,219)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from gemlite_tpu.importers import (  # noqa: E402
    from_transformers,
    load_hf_llama,
    read_safetensors,
)
from gemlite_tpu.models.llama import llama_forward, quantize_llama  # noqa: E402


def _tiny_hf_model(vocab=256, hidden=128, inter=256, layers=2, heads=4,
                   kv_heads=2, seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=512,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def _logit_parity(params, cfg, model, tokens_np, tol=2e-3):
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens_np)).logits.float().numpy()
    got = np.asarray(
        llama_forward(params, cfg, jnp.asarray(tokens_np)), np.float32)
    scale = np.abs(ref).mean() + 1e-9
    err = np.abs(got - ref).mean() / scale
    assert err < tol, f"relative logit err {err}"
    # argmax agreement is the functional bar for generation
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99, f"argmax agreement {agree}"


@pytest.mark.slow
def test_from_transformers_logit_parity():
    model = _tiny_hf_model()
    params, cfg = from_transformers(model, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 48)).astype(np.int64)
    _logit_parity(params, cfg, model, tokens, tol=5e-4)


@pytest.mark.slow
def test_load_hf_dir_safetensors_roundtrip(tmp_path):
    model = _tiny_hf_model(seed=1)
    model.save_pretrained(tmp_path)  # writes config.json + model.safetensors
    params, cfg = load_hf_llama(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=(1, 32)).astype(np.int64)
    _logit_parity(params, cfg, model, tokens, tol=5e-4)


@pytest.mark.slow
def test_load_hf_tied_embeddings(tmp_path):
    model = _tiny_hf_model(seed=2)
    model.config.tie_word_embeddings = True
    model.tie_weights()
    model.save_pretrained(tmp_path)
    params, cfg = load_hf_llama(str(tmp_path), dtype=jnp.float32)
    assert np.shares_memory(np.asarray(params["lm_head"]),
                            np.asarray(params["embed"])) or \
        (np.asarray(params["lm_head"]) == np.asarray(params["embed"])).all()
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 256, size=(1, 24)).astype(np.int64)
    _logit_parity(params, cfg, model, tokens, tol=5e-4)


def test_read_safetensors_bf16(tmp_path):
    import ml_dtypes
    from safetensors.torch import save_file
    t = torch.arange(64, dtype=torch.float32).reshape(8, 8).to(torch.bfloat16)
    save_file({"w": t}, str(tmp_path / "x.safetensors"))
    out = read_safetensors(str(tmp_path / "x.safetensors"))
    assert out["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(out["w"].astype(np.float32),
                                  np.arange(64, dtype=np.float32).reshape(8, 8))


@pytest.mark.slow
def test_import_then_quantize(tmp_path):
    """The full user flow: HF dir -> import -> quantize_llama. W8 channel-wise
    keeps tight logit parity even on random-init weights; W4 is a smoke check
    here (grouped 4-bit error on gaussian-noise weights with near-uniform
    logits is inherently large — the trained-checkpoint perplexity parity in
    examples/perplexity_parity.py is the real W4 quality evidence)."""
    from gemlite_tpu.helper import A16W8_INT8
    model = _tiny_hf_model(seed=3, hidden=256, inter=512)
    model.save_pretrained(tmp_path)
    params, cfg = load_hf_llama(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 256, size=(1, 32)))
    dense = np.asarray(llama_forward(params, cfg, tokens), np.float32)

    q8 = quantize_llama(params, processor=A16W8_INT8(dtype=jnp.float32))
    w8 = np.asarray(llama_forward(q8, cfg, tokens), np.float32)
    rel8 = np.abs(w8 - dense).mean() / (np.abs(dense).mean() + 1e-9)
    assert rel8 < 0.02, rel8

    q4 = quantize_llama(params, W_nbits=4, group_size=64)
    w4 = np.asarray(llama_forward(q4, cfg, tokens), np.float32)
    assert np.isfinite(w4).all()
    rel4 = np.abs(w4 - dense).mean() / (np.abs(dense).mean() + 1e-9)
    assert rel4 < 1.0, rel4
