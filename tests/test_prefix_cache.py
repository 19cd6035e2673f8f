# SPDX-License-Identifier: Apache-2.0
"""Prefix caching: shared KV pages across requests with common prompt
prefixes (vLLM-style automatic prefix sharing; net-new vs the reference,
which delegates serving to vLLM — reference README.md:171-196).

Invariants:
  * outputs are EXACTLY those of an engine without the cache (sharing is
    read-only; writes never land inside a matched prefix),
  * a repeated prompt attaches cached pages (hit_pages grows) and skips
    the shared portion of prefill,
  * refcounts keep pages alive while any slot uses them,
  * LRU eviction reclaims refcount-0 pages when the pool runs dry.
"""

import numpy as np
import pytest

from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama
from gemlite_tpu.serving import ContinuousBatchingEngine, Request

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)
    return params, cfg


def _engine(model, prefix_cache, **kw):
    params, cfg = model
    kw.setdefault("max_batch", 2)
    kw.setdefault("prefill_buckets", (8, 16, 32))
    kw.setdefault("page_size", 8)
    return ContinuousBatchingEngine(params, cfg, prefix_cache=prefix_cache,
                                    **kw)


def test_repeat_prompt_hits_cache_same_output(model):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=21).tolist()   # 2 full pages + tail

    base = _engine(model, prefix_cache=False)
    want = base.generate([prompt], max_new_tokens=5)[0]

    eng = _engine(model, prefix_cache=True)
    out1 = eng.generate([prompt], max_new_tokens=5)[0]
    assert eng.prefix_cache_stats()["new_pages"] == 2
    assert eng.prefix_cache_stats()["hit_pages"] == 0
    out2 = eng.generate([prompt], max_new_tokens=5)[0]
    assert eng.prefix_cache_stats()["hit_pages"] == 2
    assert out1 == want and out2 == want


def test_shared_prefix_divergent_tails(model):
    rng = np.random.default_rng(1)
    prefix = rng.integers(0, 128, size=16).tolist()   # exactly 2 pages
    tails = [rng.integers(0, 128, size=n).tolist() for n in (3, 7, 12)]
    prompts = [prefix + t for t in tails]

    base = _engine(model, prefix_cache=False)
    want = base.generate(prompts, max_new_tokens=4)

    eng = _engine(model, prefix_cache=True)
    got = eng.generate(prompts, max_new_tokens=4)
    assert got == want
    assert eng.prefix_cache_stats()["hit_pages"] >= 2  # later prompts reuse


def test_concurrent_sharers_and_refcounts(model):
    rng = np.random.default_rng(2)
    prefix = rng.integers(0, 128, size=16).tolist()
    p1 = prefix + rng.integers(0, 128, size=3).tolist()
    p2 = prefix + rng.integers(0, 128, size=5).tolist()

    base = _engine(model, prefix_cache=False)
    want = base.generate([p1, p2], max_new_tokens=8)

    # max_batch=2: both slots run concurrently; p1 finishes first (its slot
    # frees mid-run) while p2 keeps attending the shared prefix pages
    eng = _engine(model, prefix_cache=True)
    eng.submit(Request(prompt_tokens=p1, max_new_tokens=8))
    eng.submit(Request(prompt_tokens=p2, max_new_tokens=8))
    results = {tuple(r.prompt_tokens): r.output_tokens for r in eng.run()}
    assert results[tuple(p1)] == want[0]
    assert results[tuple(p2)] == want[1]
    # after both finish, every cached page is refcount-0 (evictable), and
    # the cache still holds the registered prefix pages
    assert all(v == 0 for v in eng.page_refs.values())
    assert eng.prefix_cache_stats()["cached_pages"] >= 2


def test_eviction_under_small_pool(model):
    rng = np.random.default_rng(3)
    # pool of 9 usable pages (8 + trash) with slots needing up to 8 each:
    # distinct prompts churn the cache, forcing LRU eviction of refcount-0
    # prefix pages — everything still completes correctly
    prompts = [rng.integers(0, 128, size=17 + i).tolist() for i in range(6)]

    base = _engine(model, prefix_cache=False, max_batch=1)
    want = [base.generate([p], max_new_tokens=3)[0] for p in prompts]

    eng = _engine(model, prefix_cache=True, max_batch=1, total_pages=9)
    got = [eng.generate([p], max_new_tokens=3)[0] for p in prompts]
    assert got == want
    # the pool is smaller than the total registered footprint, so eviction
    # must have run (cache can hold at most the pool)
    assert eng.prefix_cache_stats()["cached_pages"] <= 8


def test_long_prompt_rematch_near_cache_cap(model):
    """A re-admitted prompt whose match ends page-aligned near max_seq_len
    must cap the match so the remainder's padded chunk stays inside the
    cache (previously: page-table IndexError on the second admission)."""
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 128, size=60).tolist()   # max_seq_len=64, ps=8

    base = _engine(model, prefix_cache=False)
    want = base.generate([prompt], max_new_tokens=3)[0]

    eng = _engine(model, prefix_cache=True)
    out1 = eng.generate([prompt], max_new_tokens=3)[0]
    out2 = eng.generate([prompt], max_new_tokens=3)[0]   # crashed before fix
    assert out1 == want and out2 == want


def test_remainder_chunk_is_bucketed(model):
    """The cached-admission remainder prefills in its own bucket, not the
    largest one (a 4-token tail must not pad to a 32-wide program)."""
    eng = _engine(model, prefix_cache=True)
    assert eng._remainder_chunk(4) == 8
    assert eng._remainder_chunk(17) == 32
    assert eng._remainder_chunk(100) == 32    # capped at buckets[-1]


def test_serving_metrics(model):
    rng = np.random.default_rng(5)
    eng = _engine(model, prefix_cache=True)
    prompts = [rng.integers(0, 128, size=9).tolist() for _ in range(2)]
    results = []
    for p in prompts:
        eng.submit(Request(prompt_tokens=p, max_new_tokens=4))
    results = eng.run()
    for r in results:
        assert r.total_s >= r.ttft_s > 0.0
        assert r.decode_tps > 0.0
    s = eng.stats()
    assert s["tokens_out"] == sum(len(r.output_tokens) for r in results)
    assert s["decode_steps"] >= 3 and s["steps"] >= s["decode_steps"]
    assert s["tokens_per_s"] > 0
    assert "prefix_cache" in s


def test_cached_admission_skips_prefix_prefill(model):
    """The re-admitted prompt prefills only the remainder: slot_len jumps
    straight to the matched page boundary at admission."""
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=20).tolist()
    eng = _engine(model, prefix_cache=True)
    eng.generate([prompt], max_new_tokens=2)

    eng.submit(Request(prompt_tokens=prompt, max_new_tokens=2))
    eng._admit()
    slot = next(i for i, r in enumerate(eng.slot_req) if r is not None)
    assert eng.slot_len[slot] == 16                 # 2 pages attached
    assert len(eng.slot_pending[slot]) == 4         # only the tail remains
    eng.run()


def test_near_max_prompt_with_nondividing_chunk(model):
    """prefill_chunk that doesn't divide max_seq_len + a near-max prompt:
    the final padded chunk must clamp to the cache headroom (previously a
    page-table IndexError in paged mode)."""
    params, cfg = model
    rng = np.random.default_rng(8)
    prompt = rng.integers(0, 128, size=cfg.max_seq_len - 1).tolist()  # 63

    base = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                    prefill_buckets=(8, 16, 32, 64),
                                    page_size=8, prefix_cache=False)
    want = base.generate([prompt], max_new_tokens=1)[0]

    eng = ContinuousBatchingEngine(params, cfg, max_batch=1,
                                   prefill_buckets=(8, 16, 32, 64),
                                   page_size=8, prefill_chunk=20,
                                   prefix_cache=False)
    got = eng.generate([prompt], max_new_tokens=1)[0]
    assert got == want


def test_hash_collision_never_attaches_wrong_pages(model):
    """A poisoned cache entry with the right hash but different token
    content must NOT be attached (hash collisions are verified away)."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 128, size=20).tolist()
    eng = _engine(model, prefix_cache=True)

    h0 = eng._chain_hashes(prompt, eng.page_size, 1)[0]
    eng.prefix_cache[h0] = (3, tuple([999] * eng.page_size))  # wrong tokens
    eng.submit(Request(prompt_tokens=prompt, max_new_tokens=1))
    eng._admit()
    # no pages attached: the content check rejected the colliding entry
    # (the request one-shot-prefilled instead of taking the cached path)
    assert eng.prefix_stats["hit_pages"] == 0
    assert all(3 not in pages for pages in eng.slot_pages)
    eng.prefix_cache.clear()
    results = eng.run()
    assert len(results) == 1 and len(results[0].output_tokens) == 1


def test_pool_exhaustion_requeues_request(model):
    """One-shot admission hitting a dry oversubscribed pool must requeue
    the request (previously it was silently lost) and complete it once
    pages free up."""
    params, cfg = model
    rng = np.random.default_rng(10)
    # pool: trash + 8 pages; each 17-token prompt (bucket 32) needs 4 pages
    # at admission and grows during decode — two slots cannot both admit
    prompts = [rng.integers(0, 128, size=17).tolist() for _ in range(3)]

    base = ContinuousBatchingEngine(params, cfg, max_batch=2,
                                    prefill_buckets=(8, 16, 32), page_size=8,
                                    prefix_cache=False)
    want = base.generate(prompts, max_new_tokens=3)

    eng = ContinuousBatchingEngine(params, cfg, max_batch=2,
                                   prefill_buckets=(8, 16, 32), page_size=8,
                                   total_pages=9, prefix_cache=False)
    got = eng.generate(prompts, max_new_tokens=3)
    assert got == want


def test_empty_buckets_config_error(model):
    params, cfg = model
    with pytest.raises(ValueError, match="prefill bucket"):
        ContinuousBatchingEngine(params, cfg, prefill_buckets=(128, 256))
