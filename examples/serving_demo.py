# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching serving demo: many requests, few slots, one engine.

Shows the slot pool recycling, late arrivals joining running batches, and
the batched-decode throughput accounting.

Usage: python examples/serving_demo.py [--slots 4] [--requests 12]
                                       [--prefill-chunk 32] [--spec 4]
"""
import argparse
import _pathfix  # noqa: F401
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--max-new", type=int, default=24)
    ap.add_argument("--prefill-chunk", type=int, default=None,
                    help="chunked prefill: tokens per engine step for long "
                         "prompts (interleaved with decode of other slots)")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative decoding: draft tokens per step "
                         "(attaches a 1-layer draft model)")
    args = ap.parse_args()

    from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    cfg = LlamaConfig.tiny(vocab_size=2048, hidden_size=512,
                           intermediate_size=1408, num_layers=4, num_heads=8,
                           num_kv_heads=4, head_dim=64, max_seq_len=256)
    print(f"# {cfg.num_layers}L x {cfg.hidden_size}h W4 model, "
          f"{args.slots} slots, {args.requests} requests")
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=64)
    draft = None
    if args.spec:
        dcfg = LlamaConfig.tiny(vocab_size=2048, hidden_size=128,
                                intermediate_size=256, num_layers=1,
                                num_heads=4, num_kv_heads=2, head_dim=32,
                                max_seq_len=256)
        draft = (quantize_llama(init_llama(dcfg, seed=1), W_nbits=4,
                                group_size=32), dcfg)
        print(f"# speculative: {args.spec} draft tokens/step (1L draft)")
    eng = ContinuousBatchingEngine(params, cfg, max_batch=args.slots,
                                   prefill_buckets=(16, 32, 64),
                                   prefill_chunk=args.prefill_chunk,
                                   draft=draft, spec_tokens=args.spec)

    rng = np.random.default_rng(0)
    n_tok = 0
    t0 = time.perf_counter()
    for i in range(args.requests):
        plen = int(rng.integers(4, 30))
        eng.submit(Request(prompt_tokens=rng.integers(0, cfg.vocab_size,
                                                      plen).tolist(),
                           max_new_tokens=args.max_new))
    results = eng.run()
    dt = time.perf_counter() - t0
    for r in sorted(results, key=lambda r: r.request_id)[:5]:
        print(f"  req {r.request_id}: {len(r.prompt_tokens)} prompt -> "
              f"{len(r.output_tokens)} tokens ({r.finish_reason})")
    n_tok = sum(len(r.output_tokens) for r in results)
    print(f"# {len(results)} finished, {n_tok} tokens in {dt:.1f}s "
          f"({n_tok/dt:.1f} tok/s incl. compilation)")
    ttfts = sorted(r.ttft_s for r in results)
    print(f"# ttft p50/p95: {ttfts[len(ttfts)//2]*1e3:.0f}/"
          f"{ttfts[int(len(ttfts)*0.95)]*1e3:.0f} ms")
    print(f"# engine stats: {eng.stats()}")


if __name__ == "__main__":
    main()
