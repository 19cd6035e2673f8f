"""Llama model family tests: quantized forward parity, KV-cache decode parity,
QLoRA-style training, sharded model on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.models import (
    LlamaConfig, init_llama, quantize_llama, shard_llama,
    llama_forward, llama_prefill, llama_decode_step, init_kv_cache, train_step,
)
from gemlite_tpu.parallel import make_mesh

CFG = LlamaConfig.tiny()
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def params():
    return init_llama(CFG, seed=0)


@pytest.fixture(scope="module")
def qparams(params):
    return quantize_llama(params, W_nbits=4, group_size=64)


def _tokens(b, s):
    return jnp.asarray(RNG.integers(0, CFG.vocab_size, (b, s)), jnp.int32)


@pytest.mark.slow
def test_quantized_forward_close_to_float(params, qparams):
    tokens = _tokens(2, 16)
    lf = llama_forward(params, CFG, tokens).astype(jnp.float32)
    lq = llama_forward(qparams, CFG, tokens).astype(jnp.float32)
    rel = float(jnp.mean(jnp.abs(lf - lq)) / (jnp.mean(jnp.abs(lf)) + 1e-9))
    # 4-bit noise on unstructured random weights compounds over layers; real
    # checkpoints quantize far better — parity is pinned by the decode tests
    assert rel < 0.3, rel


@pytest.mark.slow
def test_decode_matches_full_forward(qparams):
    tokens = _tokens(2, 16)
    kv = init_kv_cache(CFG, 2)
    logits, kv = llama_prefill(qparams, CFG, tokens, kv)
    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    logits_d, kv = llama_decode_step(qparams, CFG, nxt, kv, jnp.int32(16))
    full = jnp.concatenate([tokens, nxt], axis=1)
    logits_full = llama_forward(qparams, CFG, full)
    err = float(jnp.mean(jnp.abs(logits_d[:, 0].astype(jnp.float32)
                                 - logits_full[:, -1].astype(jnp.float32))))
    assert err < 5e-3, err


@pytest.mark.slow
def test_multi_step_generation(qparams):
    """Greedy generation loop with jitted decode step."""
    tokens = _tokens(1, 8)
    kv = init_kv_cache(CFG, 1)
    logits, kv = llama_prefill(qparams, CFG, tokens, kv)
    step = jax.jit(lambda p, t, kv, n: llama_decode_step(p, CFG, t, kv, n))
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    out = [int(tok[0, 0])]
    for i in range(3):
        logits, kv = step(qparams, tok, kv, jnp.int32(8 + 1 + i))
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(int(tok[0, 0]))
    assert len(out) == 4


@pytest.mark.slow
def test_train_step_reduces_loss(qparams):
    tokens = _tokens(2, 17)
    loss1, p1 = train_step(qparams, CFG, tokens[:, :-1], tokens[:, 1:], lr=1e-2)
    loss2, _ = train_step(p1, CFG, tokens[:, :-1], tokens[:, 1:], lr=1e-2)
    assert float(loss2) < float(loss1)
    # packed weights unchanged (frozen)
    w0 = qparams["blocks"][0]["attn"]["wq"].W_q
    w1 = p1["blocks"][0]["attn"]["wq"].W_q
    assert jnp.array_equal(w0, w1)


@pytest.mark.slow
def test_sharded_model_matches_single(qparams):
    mesh = make_mesh({"dp": -1, "tp": 2})
    sparams = shard_llama(qparams, mesh, axis="tp")
    tokens = _tokens(2, 8)
    lq = llama_forward(qparams, CFG, tokens).astype(jnp.float32)
    ls = jax.jit(lambda p, t: llama_forward(p, CFG, t))(sparams, tokens).astype(jnp.float32)
    err = float(jnp.mean(jnp.abs(lq - ls)))
    assert err < 5e-3, err


@pytest.mark.slow
def test_per_slot_cache_len_positions(qparams):
    """llama_forward with a per-slot (B,) cache_len must align offsets
    against B, not S (previously misbroadcast: crashed for B != S and used
    the wrong slot's offset for B == S)."""
    from gemlite_tpu.models.llama import init_kv_cache as _init_kv

    B, S = 2, 3
    tokens = _tokens(B, S)
    kv = _init_kv(CFG, B)
    lens = jnp.asarray([3, 7], jnp.int32)
    logits, _ = llama_forward(qparams, CFG, tokens, kv=kv, cache_len=lens)

    # explicit positions built the correct way are the ground truth
    pos = lens[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    kv2 = _init_kv(CFG, B)
    want, _ = llama_forward(qparams, CFG, tokens, kv=kv2, cache_len=lens,
                            positions=pos)
    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(want, np.float32), rtol=1e-5)


def test_dense_shard_specs_follow_megatron_layout(params):
    """Dense (unquantized) layers: column-parallel shards the OUTPUT dim
    (dim 0 of the (N, K) matrix), row-parallel the reduction dim (dim 1) —
    previously both arms sharded K."""
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_llama(params, mesh, "tp")
    blk = sharded["blocks"][0]

    def dim_sharded(a):
        spec = a.sharding.spec
        return [i for i, s in enumerate(spec) if s is not None]

    assert dim_sharded(blk["attn"]["wq"]) == [0]     # column: N sharded
    assert dim_sharded(blk["mlp"]["gate"]) == [0]
    assert dim_sharded(blk["attn"]["wo"]) == [1]     # row: K sharded
    assert dim_sharded(blk["mlp"]["down"]) == [1]


# ---------------------------------------------------------------------------
# Fused projections (wqkv / gate_up)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fparams(params):
    return quantize_llama(params, W_nbits=4, group_size=64, fuse=True)


def test_fused_structure(fparams):
    blk = fparams["blocks"][0]
    assert set(blk["attn"]) == {"wqkv", "wo"}
    assert set(blk["mlp"]) == {"gate_up", "down"}
    QD = CFG.num_heads * CFG.head_dim
    KD = CFG.num_kv_heads * CFG.head_dim
    assert blk["attn"]["wqkv"].out_features == QD + 2 * KD
    assert blk["mlp"]["gate_up"].out_features == 2 * CFG.intermediate_size


@pytest.mark.slow
def test_fused_matches_unfused_bitexact(params, qparams, fparams):
    """Quantization groups run along K within each output row, so fusing
    along N changes neither the group boundaries nor the quantized codes —
    fused and unfused forwards must agree to float tolerance."""
    tokens = _tokens(2, 9)
    lu = llama_forward(qparams, CFG, tokens).astype(jnp.float32)
    lfu = llama_forward(fparams, CFG, tokens).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(lfu), np.asarray(lu),
                               rtol=2e-2, atol=2e-2)
    rel = float(jnp.mean(jnp.abs(lfu - lu)) / (jnp.mean(jnp.abs(lu)) + 1e-9))
    assert rel < 1e-3, rel


@pytest.mark.slow
def test_fused_decode_with_cache(fparams):
    tokens = _tokens(2, 8)
    kv = init_kv_cache(CFG, 2)
    logits, kv = llama_prefill(fparams, CFG, tokens, kv)
    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    logits_d, kv = llama_decode_step(fparams, CFG, nxt, kv, jnp.int32(8))
    full = jnp.concatenate([tokens, nxt], axis=1)
    logits_full = llama_forward(fparams, CFG, full)
    err = float(jnp.mean(jnp.abs(logits_d[:, 0].astype(jnp.float32)
                                 - logits_full[:, -1].astype(jnp.float32))))
    assert err < 5e-3, err


@pytest.mark.slow
def test_fused_sharded_matches_single(fparams):
    mesh = make_mesh({"dp": -1, "tp": 2})
    sparams = shard_llama(fparams, mesh, axis="tp")
    tokens = _tokens(2, 8)
    lref = llama_forward(fparams, CFG, tokens).astype(jnp.float32)
    lsh = llama_forward(sparams, CFG, tokens).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(lsh), np.asarray(lref),
                               rtol=5e-2, atol=5e-2)
