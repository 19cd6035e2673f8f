# SPDX-License-Identifier: Apache-2.0
"""On-chip probe: scan-over-layers decode (ops/pallas_scan + models/scan_llama).

Three questions, each answered on real Mosaic (no interpret mode):

A. Does the scalar-prefetch stacked decode kernel lower + match the
   per-layer kernel bit-for-bit at a production shape?
B. Does the stacked kernel cost the same as the per-layer kernel (i.e.
   the layer indexing adds no HBM traffic / overhead)?
C. How do compile time and HLO size scale with layer count for the
   unrolled vs scanned decode step, and what is the step-time delta?
   (ROADMAP "engine program compile time": unrolled 32-layer 8B serving
   programs take 30-60 min through this environment's proxied compiler.)

Run: python scripts/probe_scan_llama.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, n=50):
    import jax
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.ops.pallas_decode import (pallas_decode_matmul,
                                               select_decode_config)
    from gemlite_tpu.ops.pallas_scan import pallas_decode_matmul_stacked

    # ---- A + B: kernel equality and cost at 4096^2 W4 gs=128 ----------
    N = K = 4096
    gs, L, M = 128, 4, 16
    rng = np.random.default_rng(0)
    layers = []
    for _ in range(L):
        W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
        scales = (rng.uniform(0.5, 1.5, size=(N * K // gs, 1))
                  * 2.0 ** -8).astype(np.float32)
        zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
        layers.append(GemLiteLinear(4, gs, K, N, DType.BF16,
                                    DType.BF16).pack(W_q, scales, zeros))
    meta = layers[0].meta
    cfg = select_decode_config(meta, M, N, K)
    Wst = jnp.stack([l.W_q for l in layers])
    Sst = jnp.stack([l.scales for l in layers])
    Zst = jnp.stack([l.zeros for l in layers])
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)

    per_layer = jax.jit(lambda xx, w, s, z: pallas_decode_matmul(
        xx, w, s, z, None, meta, cfg))
    stacked = jax.jit(lambda xx, l: pallas_decode_matmul_stacked(
        xx, Wst, Sst, Zst, None, meta, l, cfg))
    ok = True
    for l in range(L):
        ref = per_layer(x, layers[l].W_q, layers[l].scales, layers[l].zeros)
        got = stacked(x, jnp.int32(l))
        eq = bool(jnp.array_equal(ref, got))
        ok &= eq
        print(f"A: layer {l} stacked == per-layer: {eq}", flush=True)
    print(f"A: ALL {'PASS' if ok else 'FAIL'}", flush=True)

    args0 = (layers[0].W_q, layers[0].scales, layers[0].zeros)
    dt_pl = timed(lambda: per_layer(x, *args0))
    dt_st = timed(lambda: stacked(x, jnp.int32(1)))
    wbytes = np.asarray(layers[0].W_q).nbytes
    print(f"B: per-layer {dt_pl*1e6:7.2f} us ({wbytes/dt_pl/1e9:6.1f} GB/s) | "
          f"stacked {dt_st*1e6:7.2f} us ({wbytes/dt_st/1e9:6.1f} GB/s) | "
          f"ratio {dt_st/dt_pl:.3f}", flush=True)

    # ---- C: compile-time / HLO-size scaling, unrolled vs scan ----------
    from gemlite_tpu.models.llama import (LlamaConfig, init_kv_cache,
                                          init_llama, quantize_llama,
                                          llama_decode_step_batched)
    from gemlite_tpu.models.scan_llama import (stack_blocks,
                                               llama_decode_step_scan)

    B, T = 16, 1024
    for nl in (2, 8):
        cfg_m = LlamaConfig(vocab_size=8192, hidden_size=2048,
                            intermediate_size=4096, num_layers=nl,
                            num_heads=16, num_kv_heads=8, head_dim=128,
                            max_seq_len=T)
        from gemlite_tpu.helper import A16Wn_HQQ_INT
        t0 = time.perf_counter()
        params = quantize_llama(init_llama(cfg_m),
                                processor=A16Wn_HQQ_INT(W_nbits=4,
                                                        dtype=jnp.bfloat16),
                                group_size=128)
        stk = stack_blocks(params)
        print(f"C: L={nl} quantize+stack {time.perf_counter()-t0:.1f}s",
              flush=True)
        kv = init_kv_cache(cfg_m, B)
        lens = jnp.full((B,), 17, jnp.int32)
        tok = jnp.zeros((B, 1), jnp.int32)

        f_unroll = jax.jit(lambda t_, kv_, l_: llama_decode_step_batched(
            params, cfg_m, t_, kv_, l_))
        f_scan = jax.jit(lambda t_, kv_, l_: llama_decode_step_scan(
            stk, params, cfg_m, t_, kv_, l_))
        for name, f in (("unroll", f_unroll), ("scan", f_scan)):
            t0 = time.perf_counter()
            lowered = f.lower(tok, kv, lens)
            hlo_chars = len(lowered.as_text())
            t1 = time.perf_counter()
            compiled = lowered.compile()
            t2 = time.perf_counter()
            out = compiled(tok, kv, lens)
            jax.block_until_ready(out)
            dt = timed(lambda: compiled(tok, kv, lens), n=30)
            print(f"C: L={nl} {name:6s} trace {t1-t0:6.1f}s "
                  f"compile {t2-t1:6.1f}s hlo {hlo_chars/1e6:6.2f} MChar "
                  f"step {dt*1e3:7.3f} ms", flush=True)
        # logits equality between the two programs (same kernels on-chip)
        lo_u, _ = f_unroll(tok, kv, lens)
        lo_s, _ = f_scan(tok, kv, lens)
        d = float(jnp.max(jnp.abs(lo_u.astype(jnp.float32)
                                  - lo_s.astype(jnp.float32))))
        print(f"C: L={nl} max|logit delta| unroll vs scan = {d:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
