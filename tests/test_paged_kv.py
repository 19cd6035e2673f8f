"""Paged KV cache + block-table allocator (models/paged_kv.py, serving.py).

The TPU-native analogue of vLLM's PagedAttention (the reference delegates
serving to vLLM, reference README.md:171-196). Pinned here:

* paged decode == dense-cache decode (same tokens out, both engines),
* oversubscribed pools: allocation on demand, page recycling at slot finish,
* the reserved trash page isolates stale writes from live pages,
* paged_gather round-trips what paged_write stored.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.models.llama import LlamaConfig, init_llama
from gemlite_tpu.models.paged_kv import (
    PagedKV, init_paged_kv, paged_write, paged_gather, paged_decode_attention)
from gemlite_tpu.serving import ContinuousBatchingEngine, Request

CFG = LlamaConfig.tiny()
PARAMS = init_llama(CFG, seed=3)
RNG = np.random.default_rng(5)


def _prompts(n, lo=3, hi=20):
    return [list(RNG.integers(1, CFG.vocab_size, size=RNG.integers(lo, hi)))
            for _ in range(n)]


def test_paged_write_gather_roundtrip():
    B, S, ps = 2, 10, 8
    kv = init_paged_kv(CFG, B, page_size=ps)
    k = jnp.asarray(RNG.normal(size=(B, S, CFG.num_kv_heads, CFG.head_dim)),
                    jnp.bfloat16)
    v = jnp.asarray(RNG.normal(size=(B, S, CFG.num_kv_heads, CFG.head_dim)),
                    jnp.bfloat16)
    off = jnp.asarray([[0], [5]], jnp.int32)  # per-slot offsets
    pos = off + jnp.arange(S)[None, :]
    kv = paged_write(kv, 0, k, v, pos)
    k_all, v_all = paged_gather(kv, 0)
    for b, o in enumerate([0, 5]):
        assert bool(jnp.all(k_all[b, o:o + S] == k[b]))
        assert bool(jnp.all(v_all[b, o:o + S] == v[b]))


@pytest.mark.slow
def test_paged_decode_attention_matches_dense_reference():
    B, ps = 3, 8
    T = CFG.max_seq_len
    kv = init_paged_kv(CFG, B, page_size=ps)
    lens = jnp.asarray([7, 19, 1], jnp.int32)
    S = 20
    k = jnp.asarray(RNG.normal(size=(B, S, CFG.num_kv_heads, CFG.head_dim)),
                    jnp.bfloat16)
    v = jnp.asarray(RNG.normal(size=(B, S, CFG.num_kv_heads, CFG.head_dim)),
                    jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    kv = paged_write(kv, 1, k, v, pos)
    q = jnp.asarray(RNG.normal(size=(B, CFG.num_heads, CFG.head_dim)),
                    jnp.bfloat16)
    out = paged_decode_attention(q, kv, 1, lens)

    # dense masked reference
    from gemlite_tpu.models.llama import _attention
    k_all, v_all = paged_gather(kv, 1)
    mask = (jnp.arange(k_all.shape[1])[None, :] < lens[:, None])[:, None, :]
    ref = _attention(q[:, None], k_all, v_all, mask)[:, 0]
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert d < 2e-2, d


_ENGINE_PROMPTS = _prompts(6)


def _run_engine(paged, total_pages=None, **kw):
    eng = ContinuousBatchingEngine(PARAMS, CFG, max_batch=3, seed=0,
                                   paged=paged, page_size=16,
                                   total_pages=total_pages, **kw)
    return eng.generate(_ENGINE_PROMPTS, max_new_tokens=8)


@pytest.mark.slow
def test_paged_engine_matches_dense_engine():
    outs_p = _run_engine(True)
    outs_d = _run_engine(False)
    assert outs_p == outs_d


def test_oversubscribed_pool_recycles_pages():
    # worst case would need 3 slots x 8 pages = 24 (+1 trash); give 13 —
    # admission still succeeds because pages are allocated by actual length
    # and recycled at slot finish
    outs = _run_engine(True, total_pages=13)
    ref = _run_engine(True)
    assert outs == ref


def test_pool_exhaustion_raises():
    eng = ContinuousBatchingEngine(PARAMS, CFG, max_batch=2, paged=True,
                                   page_size=16, total_pages=3)
    eng.submit(Request(prompt_tokens=list(range(1, 60)), max_new_tokens=4))
    with pytest.raises(RuntimeError, match="exhausted"):
        eng.run()


def test_trash_page_isolates_stale_writes():
    """A freed slot's table rows point at the trash page; decode steps of
    the remaining slots must not be affected by the stale slot's writes."""
    eng = ContinuousBatchingEngine(PARAMS, CFG, max_batch=2, paged=True,
                                   page_size=16)
    p = _prompts(2, lo=5, hi=10)
    eng.submit(Request(prompt_tokens=p[0], max_new_tokens=2))   # finishes early
    eng.submit(Request(prompt_tokens=p[1], max_new_tokens=12))
    res = eng.run()
    assert len(res) == 2
    # the long request's output must equal a solo run (no interference)
    eng2 = ContinuousBatchingEngine(PARAMS, CFG, max_batch=2, paged=True,
                                    page_size=16)
    eng2.submit(Request(prompt_tokens=p[1], max_new_tokens=12))
    solo = eng2.run()
    long_out = next(r for r in res if r.prompt_tokens == list(p[1]))
    assert long_out.output_tokens == solo[0].output_tokens
