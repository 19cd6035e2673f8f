# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching serving engine (tiny quantized Llama, CPU).

Net-new vs the reference (which delegates serving to vLLM, README.md:171-196).
Key invariants tested:
  * engine output == sequential whole-batch generation (slot isolation),
  * slots are recycled: more requests than slots all finish,
  * late-arriving requests join running batches (continuous batching),
  * bucketed prefill does not change results vs exact-length prefill.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gemlite_tpu.models import (
    LlamaConfig, init_llama, quantize_llama, init_kv_cache,
    llama_prefill, llama_decode_step,
)

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')
from gemlite_tpu.serving import ContinuousBatchingEngine, Request


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)
    return params, cfg


def reference_generate(params, cfg, prompt, n_new):
    """Single-sequence greedy generation with the plain model API."""
    kv = init_kv_cache(cfg, 1)
    tokens = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    logits, kv = llama_prefill(params, cfg, tokens, kv)
    tok = int(jnp.argmax(logits[0, -1]))
    out = [tok]
    pos = tokens.shape[1]
    for _ in range(n_new - 1):
        logits, kv = llama_decode_step(
            params, cfg, jnp.asarray([[tok]], jnp.int32), kv, jnp.int32(pos))
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        pos += 1
    return out


def test_engine_matches_reference(model):
    params, cfg = model
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist()
               for n in (5, 9, 17)]
    n_new = 6

    want = [reference_generate(params, cfg, p, n_new) for p in prompts]

    eng = ContinuousBatchingEngine(params, cfg, max_batch=4,
                                   prefill_buckets=(8, 16, 32))
    for p in prompts:
        eng.submit(Request(prompt_tokens=p, max_new_tokens=n_new))
    results = eng.run()
    assert len(results) == len(prompts)
    got = {tuple(r.prompt_tokens): r.output_tokens for r in results}
    for p, w in zip(prompts, want):
        assert got[tuple(p)] == w, (p, got[tuple(p)], w)


def test_slot_recycling_more_requests_than_slots(model):
    params, cfg = model
    rng = np.random.default_rng(1)
    reqs = [Request(prompt_tokens=rng.integers(0, cfg.vocab_size, size=4 + i).tolist(),
                    max_new_tokens=3 + (i % 3)) for i in range(7)]
    eng = ContinuousBatchingEngine(params, cfg, max_batch=2,
                                   prefill_buckets=(8, 16))
    for r in reqs:
        eng.submit(r)
    results = eng.run()
    assert len(results) == 7
    by_id = {r.request_id: r for r in results}
    for req in reqs:
        assert len(by_id[req.request_id].output_tokens) == req.max_new_tokens


def test_late_arrival_joins_running_batch(model):
    params, cfg = model
    rng = np.random.default_rng(2)
    p1 = rng.integers(0, cfg.vocab_size, size=6).tolist()
    p2 = rng.integers(0, cfg.vocab_size, size=7).tolist()
    n_new = 8

    want2 = reference_generate(params, cfg, p2, n_new)

    eng = ContinuousBatchingEngine(params, cfg, max_batch=4,
                                   prefill_buckets=(8, 16))
    eng.submit(Request(prompt_tokens=p1, max_new_tokens=n_new))
    for _ in range(3):
        eng.step()  # p1 in flight
    eng.submit(Request(prompt_tokens=p2, max_new_tokens=n_new))
    results = eng.run()
    got2 = next(r for r in results if r.prompt_tokens == p2)
    assert got2.output_tokens == want2


def test_eos_stops_early(model):
    params, cfg = model
    rng = np.random.default_rng(3)
    p = rng.integers(0, cfg.vocab_size, size=5).tolist()
    full = reference_generate(params, cfg, p, 8)
    eos = full[2]  # force an early stop (at its FIRST occurrence)
    stop = full.index(eos) + 1
    eng = ContinuousBatchingEngine(params, cfg, max_batch=2, eos_id=eos,
                                   prefill_buckets=(8,))
    eng.submit(Request(prompt_tokens=p, max_new_tokens=8))
    r = eng.run()[0]
    assert r.finish_reason == "eos"
    assert r.output_tokens == full[:stop]


def test_chunked_prefill_matches_whole_prefill(model):
    """Chunked admission (prefill_chunk tokens per engine step, interleaved
    with decode of other slots) must not change any output."""
    params, cfg = model
    rng = np.random.default_rng(4)
    long_p = rng.integers(0, cfg.vocab_size, size=21).tolist()
    short_p = rng.integers(0, cfg.vocab_size, size=5).tolist()
    n_new = 6

    want_long = reference_generate(params, cfg, long_p, n_new)
    want_short = reference_generate(params, cfg, short_p, n_new)

    eng = ContinuousBatchingEngine(params, cfg, max_batch=4,
                                   prefill_buckets=(8, 16, 32),
                                   prefill_chunk=8)
    eng.submit(Request(prompt_tokens=short_p, max_new_tokens=n_new))
    eng.step()  # short prompt decoding while the long one chunks in
    eng.submit(Request(prompt_tokens=long_p, max_new_tokens=n_new))
    results = eng.run()
    got_long = next(r for r in results if r.prompt_tokens == long_p)
    got_short = next(r for r in results if r.prompt_tokens == short_p)
    assert got_long.output_tokens == want_long
    assert got_short.output_tokens == want_short


def test_bucketed_decode_matches_full_attention():
    """t_active-bounded decode must produce the same tokens as full-cache
    attention (the live bucket covers every valid position)."""
    import jax
    import jax.numpy as jnp
    from gemlite_tpu.models.llama import (init_kv_cache,
                                          llama_decode_step_batched)

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)
    B = 2
    kv = init_kv_cache(cfg, B)
    rng = np.random.default_rng(0)
    # seed the caches with a few prefix positions
    lens = jnp.asarray([5, 9], jnp.int32)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)), jnp.int32)
    full_logits, kv_full = llama_decode_step_batched(params, cfg, tok, kv, lens)
    buck_logits, kv_buck = llama_decode_step_batched(params, cfg, tok, kv, lens,
                                                     t_active=16)
    np.testing.assert_allclose(np.asarray(full_logits, np.float32),
                               np.asarray(buck_logits, np.float32),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(kv_full), np.asarray(kv_buck))


def _mk_model(seed=0, layers=2, heads=4, hidden=128):
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=hidden,
                           intermediate_size=2 * hidden, num_layers=layers,
                           num_heads=heads, num_kv_heads=heads // 2,
                           head_dim=hidden // heads, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=seed), W_nbits=4, group_size=32)
    return params, cfg


def test_speculative_decoding_lossless():
    """Greedy speculative decoding must emit exactly the plain greedy
    engine's tokens (speculation is lossless under greedy acceptance)."""
    params, cfg = _mk_model(seed=0)
    dparams, dcfg = _mk_model(seed=1, layers=1, heads=2, hidden=64)

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 128, size=n)) for n in (5, 9, 3)]

    plain = ContinuousBatchingEngine(params, cfg, max_batch=4)
    want = plain.generate(prompts, max_new_tokens=12)

    spec = ContinuousBatchingEngine(params, cfg, max_batch=4,
                                    draft=(dparams, dcfg), spec_tokens=3)
    got = spec.generate(prompts, max_new_tokens=12)
    assert got == want


def test_speculative_self_draft_accepts_everything():
    """Draft == target: every draft token is accepted, so each engine step
    emits spec_tokens + 1 tokens (minus finish truncation)."""
    params, cfg = _mk_model(seed=2)
    spec = ContinuousBatchingEngine(params, cfg, max_batch=2,
                                    draft=(params, cfg), spec_tokens=3)
    spec.submit(Request(prompt_tokens=[1, 2, 3], max_new_tokens=9))
    steps = 0
    while spec.num_active or spec.queue:
        spec.step()
        steps += 1
    # 9 tokens = (prefill token + burst of 4) in step 1, + burst of 4 in
    # step 2: a plain engine needs 9 steps, the self-draft engine 2
    assert steps == 2, steps

    plain = ContinuousBatchingEngine(params, cfg, max_batch=2)
    want = plain.generate([[1, 2, 3]], max_new_tokens=9)
    out, spec.finished = spec.finished, []
    assert [r.output_tokens for r in out] == want


def test_engine_with_tp_sharded_params():
    """Mesh-ready claim: the engine works unchanged when the model params are
    tensor-parallel sharded over a device mesh, and emits the same tokens."""
    from jax.sharding import Mesh
    from gemlite_tpu.models.llama import shard_llama

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    params, cfg = _mk_model(seed=3)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, 128, size=n)) for n in (6, 11)]

    plain = ContinuousBatchingEngine(params, cfg, max_batch=2)
    want = plain.generate(prompts, max_new_tokens=10)

    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_llama(params, mesh, "tp")
    eng = ContinuousBatchingEngine(sharded, cfg, max_batch=2)
    got = eng.generate(prompts, max_new_tokens=10)
    assert got == want


def test_speculative_sampled_self_draft_accepts_all():
    """Rejection sampling with draft == target: p == q so every draft token
    is accepted (u < 1 always) even at temperature > 0."""
    params, cfg = _mk_model(seed=4)
    spec = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                    draft=(params, cfg), spec_tokens=3, seed=7)
    spec.submit(Request(prompt_tokens=[5, 6, 7], max_new_tokens=9,
                        temperature=0.8))
    steps = 0
    while spec.num_active or spec.queue:
        spec.step()
        steps += 1
    out = spec.finished[0].output_tokens
    assert len(out) == 9
    assert steps == 2, steps  # (prefill + burst of 4) then burst of 4
    assert all(0 <= t < cfg.vocab_size for t in out)


def test_speculative_sampled_deterministic_per_seed():
    params, cfg = _mk_model(seed=5)
    dparams, dcfg = _mk_model(seed=6, layers=1, heads=2, hidden=64)

    def run(seed):
        eng = ContinuousBatchingEngine(params, cfg, max_batch=1, seed=seed,
                                       draft=(dparams, dcfg), spec_tokens=2)
        return eng.generate([[3, 1, 4]], max_new_tokens=8, temperature=0.7)[0]

    a, b, c = run(0), run(0), run(1)
    assert a == b
    assert all(0 <= t < cfg.vocab_size for t in a)


def test_long_prompt_with_larger_prefill_chunk():
    """Prompt longer than the largest bucket but shorter than prefill_chunk
    must still auto-chunk (regression: it crashed on the bucket buffer)."""
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=1, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)
    eng = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                   prefill_buckets=(8, 16),
                                   prefill_chunk=48)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, 128, size=30))
    out = eng.generate([prompt], max_new_tokens=6)
    assert len(out[0]) == 6

    # result equals the unchunked engine's
    ref = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                   prefill_buckets=(8, 16, 32))
    assert out == ref.generate([prompt], max_new_tokens=6)


def test_spec_draft_cache_has_no_hole_after_full_acceptance():
    """Regression: on full acceptance the last drafted token's KV must be in
    the DRAFT cache (it used to stay a zero row forever)."""
    params, cfg = _mk_model(seed=4)
    g = 3
    eng = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                   draft=(params, cfg), spec_tokens=g)
    eng.submit(Request(prompt_tokens=[1, 2, 3], max_new_tokens=4 + g))
    eng.step()   # prefill token + one full-acceptance burst of g+1
    plen = 3
    # positions plen .. plen+g must all be written in the draft cache
    rows = np.asarray(eng.draft_kv)[0, 0, 0, plen:plen + g + 1]
    assert (np.abs(rows).sum(axis=(1, 2)) > 0).all()


def test_engine_with_fused_projections(model):
    """The serving engine must produce IDENTICAL tokens when the model is
    quantized with fuse=True (wqkv / gate_up single layers): fused
    quantization is value-identical (groups run along K), so greedy decode
    must not change."""
    params, cfg = model
    fused = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32,
                           fuse=True)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist()
               for n in (4, 11)]
    n_new = 5
    want = [reference_generate(params, cfg, p, n_new) for p in prompts]
    eng = ContinuousBatchingEngine(fused, cfg, max_batch=2,
                                   prefill_buckets=(8, 16, 32))
    for p in prompts:
        eng.submit(Request(prompt_tokens=p, max_new_tokens=n_new))
    results = eng.run()
    got = {tuple(r.prompt_tokens): r.output_tokens for r in results}
    for p, w in zip(prompts, want):
        assert got[tuple(p)] == w, (p, got[tuple(p)], w)
