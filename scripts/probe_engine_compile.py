# SPDX-License-Identifier: Apache-2.0
"""Probe: serving-engine program compile time vs layer count on the real
chip (the round-5 stage-2 prefill compile stalled >40 min at 32 layers).

Times, per layer count: the engine's paged prefill program, the batched
paged decode program, and (for contrast) the DENSE-cache variants — to
isolate whether the paged scatter/gather lowering is what blows up.

Usage: python -u scripts/probe_engine_compile.py [--layers 2,4,8] [--dense]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="2,4")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compile cache (true timing)")
    args = ap.parse_args()

    import jax
    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig
    from gemlite_tpu.serving import ContinuousBatchingEngine, Request

    for L in [int(x) for x in args.layers.split(",")]:
        cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                          intermediate_size=14336, num_layers=L,
                          num_heads=32, num_kv_heads=8, head_dim=128,
                          max_seq_len=512)
        t0 = time.time()
        params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
        print(f"L={L}: built in {time.time()-t0:.0f}s", flush=True)
        for paged in (True, False):
            eng = ContinuousBatchingEngine(
                params, cfg, max_batch=args.max_batch, paged=paged,
                page_size=128, prefill_buckets=(128,), prefix_cache=False)
            rng = np.random.default_rng(0)
            prompt = rng.integers(3, 1000, 128)
            t0 = time.time()
            eng.submit(Request(prompt_tokens=prompt, max_new_tokens=4))
            eng.step()                       # prefill compile + first token
            t_prefill = time.time() - t0
            t0 = time.time()
            eng.step()                       # decode compile
            t_decode = time.time() - t0
            eng.run(max_steps=8)
            print(f"L={L} paged={paged}: prefill-compile {t_prefill:.0f}s, "
                  f"decode-compile {t_decode:.0f}s", flush=True)
            del eng


if __name__ == "__main__":
    main()
