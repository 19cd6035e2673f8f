# SPDX-License-Identifier: Apache-2.0
"""Round-5 real-chip serving-engine session (SERVING.md evidence).

The serving engine (gemlite_tpu/serving.py) replaces the vLLM/SGLang
delegation of the reference (reference README.md:171-196); until this round
every one of its claims was CPU-interpret-tested only. This driver runs the
engine ON THE REAL CHIP and emits one JSON line per measurement to
SERVING_raw.jsonl, from which SERVING.md is composed.

Stages (each `--only N` runnable standalone; results append):
  1. correctness gate, tiny trained model: engine (paged + dense) greedy
     tokens MUST equal the bare llama_decode_step loop — on-chip TPUCHECK
     analogue for the serving stack.
  2. engine throughput vs active slots, Llama-8B geometry W4 gs=128,
     slots in {1, 8, 16, 32}: aggregate tok/s, decode-only tok/s,
     per-step wall time (tunnel dispatch overhead reported separately).
  3. same at W2 gs=128 fused (the serving-optimized config).
  4. paged vs contiguous (dense bucketed) KV overhead at 8 slots.
  5. chunked prefill TTFT: long admission into a busy engine, with and
     without prefill_chunk; TTFT of the long request + stall of others.
  6. prefix cache: 16 requests sharing a long prefix, cache on vs off.
  7. speculative decoding, trained tiny model: W8 target + W4 draft of the
     same checkpoint — acceptance rate + emitted tokens/step + wall speedup.

Usage:  python scripts/round5_serving_driver.py [--only N] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np

OUT = os.path.join(REPO, "SERVING_raw.jsonl")


def emit(rec):
    rec = dict(rec, ts=round(time.time(), 1))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("EMIT " + json.dumps(rec), flush=True)


def stage(n, title):
    print(f"\n========== STAGE {n}: {title} ==========", flush=True)
    return time.time()


# ---------------------------------------------------------------------------
# model builders
# ---------------------------------------------------------------------------

def load_tiny(quant="w8", fuse=False):
    """Trained 4.85M byte-level Llama, quantized."""
    import jax.numpy as jnp
    from gemlite_tpu.importers import load_hf_llama
    from gemlite_tpu.models.llama import quantize_llama

    params, cfg = load_hf_llama(os.path.join(REPO, "checkpoints", "tiny_en_5m"),
                                dtype=jnp.bfloat16)
    nbits = {"w8": 8, "w4": 4, "w2": 2}[quant]
    qp = quantize_llama(params, W_nbits=nbits, group_size=64, fuse=fuse)
    return qp, cfg


def bare_generate(params, cfg, prompt, n_new):
    """Greedy reference loop: one-shot prefill + per-token decode steps
    (dense cache, B=1). The engine must reproduce these tokens exactly."""
    import jax
    import jax.numpy as jnp
    from gemlite_tpu.models.llama import (init_kv_cache, llama_forward,
                                          llama_decode_step)

    kv = init_kv_cache(cfg, 1)
    toks = jnp.asarray(np.asarray(prompt, np.int32)[None, :])

    @jax.jit
    def prefill(params, toks, kv):
        logits, kv = llama_forward(params, cfg, toks, kv=kv, cache_len=0)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), kv

    decode = jax.jit(
        lambda params, tok, kv, pos: (
            lambda lo_kv: (jnp.argmax(lo_kv[0][:, -1], axis=-1).astype(jnp.int32),
                           lo_kv[1])
        )(llama_decode_step(params, cfg, tok, kv, pos)))

    tok, kv = prefill(params, toks, kv)
    out = [int(tok[0])]
    pos = len(prompt)
    for _ in range(n_new - 1):
        tok, kv = decode(params, tok[:, None], kv, jnp.int32(pos))
        out.append(int(tok[0]))
        pos += 1
    return out


def make_prompts(rng, n, lo, hi, vocab, prefix=None):
    out = []
    for _ in range(n):
        L = int(rng.integers(lo, hi + 1))
        p = rng.integers(3, vocab, size=L).astype(np.int32)
        if prefix is not None:
            p = np.concatenate([prefix, p])
        out.append(p)
    return out


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def _divergence_gap(params, cfg, prompt, ref_out, got_out):
    """First-divergence analysis: teacher-force the bare model over the
    ENGINE's tokens up to the first mismatch and return (index, logit gap
    between the two candidate tokens). Batched (B>1) and single-row (B=1)
    matmuls legitimately differ in bf16 reduction order; a greedy argmax can
    flip ONLY where the top-2 logits are within that noise, so the gate
    accepts divergences whose gap is a near-tie (and nothing else)."""
    import jax
    import jax.numpy as jnp
    from gemlite_tpu.models.llama import llama_forward

    i = next(j for j, (a, b) in enumerate(zip(ref_out, got_out)) if a != b)
    seq = np.concatenate([np.asarray(prompt, np.int32),
                          np.asarray(got_out[:i], np.int32)])
    logits = jax.jit(lambda p, t: llama_forward(p, cfg, t))(
        params, jnp.asarray(seq[None, :]))
    last = np.asarray(logits[0, -1].astype(jnp.float32))
    gap = float(abs(last[ref_out[i]] - last[got_out[i]]))
    top2 = np.sort(last)[-2:]
    return i, gap, float(top2[1] - top2[0])


def stage1_correctness():
    t0 = stage(1, "correctness gate: engine == bare loop (tiny trained, W8)")
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    params, cfg = load_tiny("w8")
    rng = np.random.default_rng(0)
    prompts = make_prompts(rng, 6, 9, 90, cfg.vocab_size)
    N_NEW = 24
    TIE_TOL = 0.05   # bf16 batched-vs-single reduction noise at logit scale

    ref = [bare_generate(params, cfg, p, N_NEW) for p in prompts]

    results, exact, ties = {}, {}, []

    def grade(mode, got):
        n_exact = sum(g == r for g, r in zip(got, ref))
        ok = True
        for i, (g, r) in enumerate(zip(got, ref)):
            if g == r:
                continue
            di, gap, _ = _divergence_gap(params, cfg, prompts[i], r, g)
            ties.append({"mode": mode, "seq": i, "pos": di,
                         "logit_gap": round(gap, 4)})
            print(f"   {mode} seq{i}: diverges at tok {di}, "
                  f"logit gap {gap:.4f} (tie tol {TIE_TOL})", flush=True)
            if gap > TIE_TOL:
                ok = False
        results[mode] = ok
        exact[mode] = n_exact
        print(f"  {mode}: {n_exact}/{len(ref)} sequences exact", flush=True)

    for paged in (True, False):
        eng = ContinuousBatchingEngine(params, cfg, max_batch=4, paged=paged,
                                       page_size=64, prefill_buckets=(32, 64, 128),
                                       prefix_cache=False)
        for p in prompts:
            eng.submit(Request(prompt_tokens=p, max_new_tokens=N_NEW))
        res = {r.request_id: r.output_tokens for r in eng.run()}
        got = [res[i] for i in sorted(res)]
        grade("paged" if paged else "dense", got)
    # chunked-prefill path must also be token-exact (up to the same ties)
    eng = ContinuousBatchingEngine(params, cfg, max_batch=4, paged=True,
                                   page_size=64, prefill_buckets=(32, 64, 128),
                                   prefill_chunk=32, prefix_cache=False)
    for p in prompts:
        eng.submit(Request(prompt_tokens=p, max_new_tokens=N_NEW))
    res = {r.request_id: r.output_tokens for r in eng.run()}
    got = [res[i] for i in sorted(res)]
    grade("chunked", got)

    emit({"stage": "correctness", "model": "tiny_en_5m W8 gs=64",
          "n_seq": len(ref), "n_new": N_NEW, "tie_tol": TIE_TOL,
          "exact": exact, "divergences": ties,
          "paged_pass": results["paged"], "dense_pass": results["dense"],
          "chunked_pass": results["chunked"],
          "pass": all(results.values())})
    print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)


def _run_engine_throughput(params, cfg, label, slots_list, paged=True,
                           prompt_len=128, n_new=64, max_batch=32,
                           page_size=128):
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    rng = np.random.default_rng(1)
    for n_slots in slots_list:
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=max_batch, paged=paged,
            page_size=page_size,
            prefill_buckets=(128, 256, 512), prefix_cache=False)
        prompts = make_prompts(rng, n_slots, prompt_len, prompt_len,
                               cfg.vocab_size)
        # warmup: compile prefill + decode programs on a single request
        eng.submit(Request(prompt_tokens=prompts[0], max_new_tokens=4))
        eng.run()
        t0 = time.monotonic()
        for p in prompts:
            eng.submit(Request(prompt_tokens=p, max_new_tokens=n_new))
        res = eng.run()
        wall = time.monotonic() - t0
        toks = sum(len(r.output_tokens) for r in res)
        st = eng.stats()
        dec_steps = st["decode_steps"]
        # decode-only throughput: subtract admissions (prefill) by timing
        # per-step wall of the steady decode phase
        ttfts = sorted(r.ttft_s for r in res)
        dtps = [r.decode_tps for r in res if r.decode_tps > 0]
        rec = {"stage": "throughput", "model": label, "paged": paged,
               "slots": n_slots, "prompt_len": prompt_len, "n_new": n_new,
               "wall_s": round(wall, 3), "tokens": toks,
               "agg_tok_s": round(toks / wall, 1),
               "decode_steps": dec_steps,
               "step_ms": round(1e3 * wall / max(st["steps"], 1), 2),
               "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3),
               "ttft_max_s": round(ttfts[-1], 3),
               "per_seq_decode_tok_s_mean": round(float(np.mean(dtps)), 1)
               if dtps else 0.0}
        emit(rec)


def stage2_throughput_w4():
    t0 = stage(2, "Llama-8B geometry W4 engine throughput vs slots")
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=512)
    params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
    print(f"  built in {time.time()-t0:.0f}s", flush=True)
    _run_engine_throughput(params, cfg, "llama8b W4 gs=128", [1, 8, 16, 32])
    print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)


def stage3_throughput_w2_fused():
    t0 = stage(3, "Llama-8B geometry W2 fused engine throughput vs slots")
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=512)
    params = build_quantized_llama(cfg, W_nbits=2, group_size=128, fuse=True)
    print(f"  built in {time.time()-t0:.0f}s", flush=True)
    _run_engine_throughput(params, cfg, "llama8b W2 gs=128 fused",
                           [1, 8, 16, 32])
    print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)


def stage4_paged_vs_dense():
    # max_batch=32 on BOTH sides so the paged run reuses stage 2's compiled
    # programs (one new compile: the dense bucketed decode)
    t0 = stage(4, "paged vs contiguous KV overhead (8 active slots, W4)")
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=512)
    params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
    print(f"  built in {time.time()-t0:.0f}s", flush=True)
    _run_engine_throughput(params, cfg, "llama8b W4 gs=128", [8], paged=True,
                           max_batch=32)
    _run_engine_throughput(params, cfg, "llama8b W4 gs=128", [8], paged=False,
                           max_batch=32)
    print(f"stage 4 done in {time.time()-t0:.0f}s", flush=True)


def stage5_chunked_ttft():
    t0 = stage(5, "chunked prefill TTFT under load (W4, long admission)")
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=1024)
    params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
    print(f"  built in {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(2)
    LONG = 768
    # compile budget (each fresh program is ~half an hour through the dev
    # proxy): buckets (128, 1024) -> exactly three big programs across
    # stages 5+6 (one-shot-1024 prefill, 256-chunk, decode-8)

    for chunk in (None, 256):
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=8, paged=True, page_size=128,
            prefill_buckets=(128, 1024),
            prefill_chunk=chunk, prefix_cache=False)
        # warmup compiles: short + long + decode
        eng.submit(Request(prompt_tokens=rng.integers(3, 1000, 128),
                           max_new_tokens=4))
        eng.run()
        eng.submit(Request(prompt_tokens=rng.integers(3, 1000, LONG),
                           max_new_tokens=4))
        eng.run()
        # variant warmup: a long admission INTO active decode compiles a
        # distinct decode-program variant (identical arg shapes/dtypes —
        # the cache key difference is the donated chunk-output buffer
        # layout); without this the measured p99 absorbs an ~18 s one-time
        # XLA compile (bisected in /tmp/s5_bisect.py, round 5)
        for r in [Request(prompt_tokens=rng.integers(3, 1000, 128),
                          max_new_tokens=24) for _ in range(2)]:
            eng.submit(r)
        for _ in range(3):
            eng.step()
        eng.submit(Request(prompt_tokens=rng.integers(3, 1000, LONG),
                           max_new_tokens=4))
        eng.run()
        # 7 short decoding streams
        shorts = [Request(prompt_tokens=rng.integers(3, 1000, 128),
                          max_new_tokens=96) for _ in range(7)]
        for r in shorts:
            eng.submit(r)
        # let them reach steady decode
        for _ in range(8):
            eng.step()
        # measure per-step stall while the long prompt admits + prefills
        step_times = []
        long_req = Request(prompt_tokens=rng.integers(3, 1000, LONG),
                           max_new_tokens=8)
        eng.submit(long_req)
        while eng.queue or eng.num_active:
            had_queue = bool(eng.queue)
            had_pending = any(p is not None for p in eng.slot_pending)
            s0 = time.monotonic()
            eng.step()
            dt = time.monotonic() - s0
            step_times.append(dt)
            if dt > 0.5:
                print(f"   SLOW step {len(step_times)}: {dt*1e3:.0f} ms "
                      f"(admitting={had_queue}, mid_prefill={had_pending}, "
                      f"active={eng.num_active})", flush=True)
        res = eng.finished
        long_ttft = [r.ttft_s for r in res if r.request_id == long_req.request_id]
        st = sorted(step_times)
        emit({"stage": "chunked_ttft", "model": "llama8b W4 gs=128",
              "prefill_chunk": chunk, "long_prompt": LONG,
              "long_ttft_s": round(long_ttft[0], 3) if long_ttft else None,
              "step_p50_ms": round(1e3 * st[len(st) // 2], 1),
              "step_p99_ms": round(1e3 * st[min(len(st) - 1, int(len(st) * .99))], 1),
              "step_max_ms": round(1e3 * st[-1], 1),
              "n_steps": len(st)})
    print(f"stage 5 done in {time.time()-t0:.0f}s", flush=True)


def stage6_prefix_cache():
    t0 = stage(6, "prefix cache speedup (shared 512-token prefix, W4)")
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=1024)
    params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
    print(f"  built in {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(3)
    prefix = rng.integers(3, 1000, 512).astype(np.int32)
    tails = make_prompts(rng, 12, 40, 120, 1000)

    for use_prefix in (False, True):
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=8, paged=True, page_size=128,
            prefill_buckets=(128, 1024),
            prefill_chunk=256, prefix_cache=use_prefix)
        # warmup compiles (chunk + decode)
        eng.submit(Request(prompt_tokens=np.concatenate([prefix, tails[0]]),
                           max_new_tokens=4))
        eng.run()
        t1 = time.monotonic()
        reqs = [Request(prompt_tokens=np.concatenate([prefix, t]),
                        max_new_tokens=32) for t in tails]
        for r in reqs:
            eng.submit(r)
        res = eng.run()
        wall = time.monotonic() - t1
        ttfts = sorted(r.ttft_s for r in res)
        emit({"stage": "prefix_cache", "model": "llama8b W4 gs=128",
              "prefix_cache": use_prefix, "shared_prefix": 512,
              "n_req": len(reqs), "wall_s": round(wall, 3),
              "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3),
              "ttft_max_s": round(ttfts[-1], 3),
              "stats": eng.prefix_cache_stats() if use_prefix else None})
    print(f"stage 6 done in {time.time()-t0:.0f}s", flush=True)


def stage7_spec_decode():
    # draft = W4 of the same checkpoint: close to the target distribution
    # (nll 0.31 vs the target's 0.20 — W2_ABLATION.md) at half the weight
    # stream. The first run used a W2 draft, whose 2.76 nll makes it a
    # near-random proposer (0.30 accepted/burst, spec LOST 2x) — committed
    # in SERVING_raw.jsonl as the bad-draft ablation point.
    t0 = stage(7, "speculative decode: trained tiny W8 target + W4 draft")
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    params, cfg = load_tiny("w8")
    draft_params, draft_cfg = load_tiny("w4")
    rng = np.random.default_rng(4)
    # English-like prompts: reuse holdout text bytes so the trained model's
    # predictions (and therefore the draft's agreement) are realistic
    with open(os.path.join(REPO, "checkpoints", "tiny_en_5m", "holdout.txt"),
              "rb") as f:
        data = np.frombuffer(f.read(), np.uint8)
    starts = rng.integers(0, len(data) - 128, size=8)
    prompts = [data[s:s + 96].astype(np.int32) for s in starts]
    N_NEW = 96

    results = {}
    for gamma in (0, 4):
        eng = ContinuousBatchingEngine(
            params, cfg, max_batch=8, paged=False,
            prefill_buckets=(32, 64, 128),
            draft=(draft_params, draft_cfg) if gamma else None,
            spec_tokens=gamma)
        eng.submit(Request(prompt_tokens=prompts[0], max_new_tokens=4))
        eng.run()
        t1 = time.monotonic()
        for p in prompts:
            eng.submit(Request(prompt_tokens=p, max_new_tokens=N_NEW))
        res = eng.run()
        wall = time.monotonic() - t1
        toks = sum(len(r.output_tokens) for r in res)
        st = eng.stats()
        results[gamma] = (wall, toks, st)
        emit({"stage": "spec_decode", "model": "tiny_en_5m W8 + W4 draft",
              "gamma": gamma, "wall_s": round(wall, 3), "tokens": toks,
              "agg_tok_s": round(toks / wall, 1),
              "spec_steps": st.get("spec_steps", 0),
              "decode_steps": st.get("decode_steps", 0),
              "tokens_per_engine_step": round(
                  toks / max(st.get("spec_steps", 0)
                             + st.get("decode_steps", 0), 1), 2)})
    if 0 in results and 4 in results:
        w0, _, _ = results[0]
        w4, _, _ = results[4]
        emit({"stage": "spec_decode_summary",
              "wall_speedup": round(w0 / w4, 2)})
    print(f"stage 7 done in {time.time()-t0:.0f}s", flush=True)


def stage8_device_throughput():
    """Device-side engine decode throughput: lax.scan the engine's OWN
    batched decode step (same program the engine dispatches — paged KV,
    per-slot offsets, sampling, lens advance) for n steps inside one jit
    and slope-time it. This is what a normally-attached deployment gets
    per step; the per-step wall numbers in stages 2-4 additionally pay
    this environment's tunnel RPCs (which ranged 0.1-1.7 s/step across
    sessions)."""
    t0 = stage(8, "device-side engine decode step (scan inside one jit)")
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import lax
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=512)
    rng = np.random.default_rng(5)
    for label, nbits, fuse in (("W4", 4, False), ("W2 fused", 2, True)):
        params = build_quantized_llama(cfg, W_nbits=nbits, group_size=128,
                                       fuse=fuse)
        eng = ContinuousBatchingEngine(params, cfg, max_batch=32, paged=True,
                                       page_size=128, prefill_buckets=(128,),
                                       prefix_cache=False)
        # fill all 32 slots via real admissions so the paged tables/lens
        # are genuine engine state
        for _ in range(32):
            eng.submit(Request(prompt_tokens=rng.integers(3, 1000, 128),
                               max_new_tokens=400))
        eng.step()                    # admit + first decode (compiles)
        eng._sync_table()
        B = eng.max_batch
        lens = jnp.asarray(eng.slot_len + np.array(
            [max(len(o) - 1, 0) for o in eng.slot_out], np.int32))
        tokens = jnp.asarray(eng.slot_last.reshape(-1, 1))
        temps = jnp.zeros((B,), jnp.float32)
        act = jnp.ones((B,), jnp.int32)

        @partial(jax.jit, static_argnames=("n",))
        def scan_steps(params, tokens, kv, lens, key, n):
            def body(carry, _):
                tokens, kv, lens, key = carry
                nxt, kv, key, lens = eng._decode_impl(
                    params, tokens, kv, lens, key, temps, act, t_active=None)
                return (nxt[:, None], kv, lens, key), nxt[0]
            (tokens, kv, lens, key), toks = lax.scan(
                body, (tokens, kv, lens, key), None, length=n)
            return toks

        n1, n2 = 16, 64
        for n in (n1, n2):
            float(scan_steps(params, tokens, eng.kv, lens, eng.key,
                             n).sum())
        best = {}
        for n in (n1, n2) * 4:
            t1 = time.monotonic()
            float(scan_steps(params, tokens, eng.kv, lens, eng.key,
                             n).sum())
            best[n] = min(best.get(n, 1e9), time.monotonic() - t1)
        dt = (best[n2] - best[n1]) / (n2 - n1)
        emit({"stage": "device_throughput", "model": f"llama8b {label}",
              "slots": B, "step_device_ms": round(dt * 1e3, 2),
              "agg_tok_s_device": round(B / dt, 1),
              "per_seq_tok_s_device": round(1 / dt, 2)})
        del params, eng
    print(f"stage 8 done in {time.time()-t0:.0f}s", flush=True)


STAGES = {1: stage1_correctness, 2: stage2_throughput_w4,
          3: stage3_throughput_w2_fused, 4: stage4_paged_vs_dense,
          5: stage5_chunked_ttft, 6: stage6_prefix_cache,
          7: stage7_spec_decode, 8: stage8_device_throughput}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=int, default=0)
    ap.add_argument("--skip", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print(f"devices: {jax.devices()}", flush=True)
    # tunnel-phase calibration: median round-trip of a trivial dispatch +
    # scalar download — the per-step floor every engine wall number below
    # pays (observed 0.03-0.9 s across sessions in this environment)
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: (x * 2).sum())
    float(tiny(jnp.ones((8, 8))))
    rtts = []
    for _ in range(12):
        t0 = time.monotonic()
        float(tiny(jnp.ones((8, 8))))
        rtts.append(time.monotonic() - t0)
    rtts.sort()
    emit({"stage": "session", "backend": jax.default_backend(),
          "device": str(jax.devices()[0]),
          "rpc_rtt_p50_ms": round(1e3 * rtts[len(rtts) // 2], 1),
          "rpc_rtt_min_ms": round(1e3 * rtts[0], 1)})

    for n, fn in STAGES.items():
        if args.only and n != args.only:
            continue
        if n <= args.skip:
            continue
        fn()


if __name__ == "__main__":
    main()
