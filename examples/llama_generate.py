# SPDX-License-Identifier: Apache-2.0
"""End-to-end example: quantize a Llama model to W4 and generate greedily.

Counterpart of the reference's vLLM/transformers integration examples
(README.md:171-229): build a model, patch every linear with a quantized one,
run prefill + decode with a KV cache.

Usage: python examples/llama_generate.py [--steps 16]
"""
import argparse
import _pathfix  # noqa: F401  (source-checkout import path)
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--gs", type=int, default=64)
    ap.add_argument("--fuse", action="store_true",
                    help="fuse q/k/v -> wqkv and gate/up -> gate_up "
                         "(one wide kernel call per group; same numerics)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gemlite_tpu.models import (
        LlamaConfig, init_llama, quantize_llama, llama_prefill,
        llama_decode_step, init_kv_cache,
    )

    cfg = LlamaConfig.tiny(vocab_size=2048, hidden_size=512,
                           intermediate_size=1408, num_layers=4, num_heads=8,
                           num_kv_heads=4, head_dim=64, max_seq_len=256)
    print(f"# model: {cfg.num_layers}L x {cfg.hidden_size}h, "
          f"W{args.nbits} gs={args.gs}")

    params = quantize_llama(init_llama(cfg, seed=0),
                            W_nbits=args.nbits, group_size=args.gs,
                            fuse=args.fuse)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
    kv = init_kv_cache(cfg, batch=1)

    prefill = jax.jit(lambda p, t, kv: llama_prefill(p, cfg, t, kv))
    decode = jax.jit(lambda p, t, kv, n: llama_decode_step(p, cfg, t, kv, n))

    t0 = time.perf_counter()
    logits, kv = prefill(params, prompt, kv)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    jax.block_until_ready(tok)
    t_prefill = time.perf_counter() - t0

    out = [int(tok[0, 0])]
    pos = prompt.shape[1]
    t0 = time.perf_counter()
    for i in range(args.steps - 1):
        logits, kv = decode(params, tok, kv, jnp.int32(pos))
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(int(tok[0, 0]))
        pos += 1
    jax.block_until_ready(tok)
    t_decode = time.perf_counter() - t0

    print(f"prompt[{prompt.shape[1]} tok] -> generated {len(out)} tokens")
    print("tokens:", out)
    # both timings include one-time XLA compilation (the first prefill /
    # decode call); use examples/llama8b_bench.py for steady-state numbers
    print(f"prefill: {t_prefill*1e3:.1f} ms   "
          f"decode: {t_decode/max(1, args.steps-1)*1e3:.2f} ms/tok "
          f"(both incl. compile)")


if __name__ == "__main__":
    main()
