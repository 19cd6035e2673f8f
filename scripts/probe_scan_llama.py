# SPDX-License-Identifier: Apache-2.0
"""On-chip probe: scan-over-layers decode (ops/pallas_scan + models/scan_llama).

Three questions, each answered on real Mosaic (no interpret mode):

A. Does the scalar-prefetch stacked decode kernel lower + match the
   per-layer kernel bit-for-bit at a production shape?
B. Does the stacked kernel cost the same as the per-layer kernel (i.e.
   the in-kernel layer indexing adds no HBM traffic / overhead)?
   Timed DEVICE-SIDE (fori_loop with a data dependence) so the dev
   tunnel's ~0.7 ms per-dispatch RTT cancels; the layer index varies
   per iteration like a real scan.
C. How do trace+compile time and HLO size scale with layer count for
   the unrolled vs scanned decode step, and what is the step-time
   delta? (ROADMAP "engine program compile time": unrolled 32-layer 8B
   serving programs take 30-60 min through this environment's proxied
   compiler.) Params ride as jit ARGUMENTS (a first version closed
   over them, inlining the weights as HLO constants — 214 MChar HLO
   for a 2-layer model and meaningless compile times) and the KV cache
   is donated, matching the engine's production jit.

Run: python scripts/probe_scan_llama.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_device(fn_loop, n1, repeats=5):
    """Device-side rate: jit a fori_loop of the op, time n1 vs 4*n1 calls,
    slope = per-iteration time (tunnel RTT + dispatch cancel)."""
    import jax

    float(fn_loop(4 * n1))  # warm both trip counts' programs? (same program)
    best = {}
    for n in (n1, 4 * n1) * repeats:
        t0 = time.perf_counter()
        float(fn_loop(n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[4 * n1] - best[n1]) / (3 * n1)


def timed_wall(fn, n=30):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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
    print(f"A: stacked == per-layer for all {L} layers: "
          f"{'PASS' if ok else 'FAIL'}", flush=True)

    # device-side loops: scalar data-dependence keeps iterations ordered;
    # the stacked loop cycles the layer index like a real scan
    W0, S0, Z0 = layers[0].W_q, layers[0].scales, layers[0].zeros

    @jax.jit
    def loop_pl(x0, n):
        def body(i, xx):
            y = pallas_decode_matmul(xx, W0, S0, Z0, None, meta, cfg)
            return xx + (jnp.sum(y.astype(jnp.float32)) * 1e-30
                         ).astype(xx.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    @jax.jit
    def loop_st(x0, n):
        def body(i, xx):
            y = pallas_decode_matmul_stacked(xx, Wst, Sst, Zst, None, meta,
                                             i % L, cfg)
            return xx + (jnp.sum(y.astype(jnp.float32)) * 1e-30
                         ).astype(xx.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x0).astype(jnp.float32))

    dt_pl = timed_device(lambda n: loop_pl(x, n), 400)
    dt_st = timed_device(lambda n: loop_st(x, n), 400)
    wbytes = np.asarray(W0).nbytes
    print(f"B: per-layer {dt_pl*1e6:7.2f} us ({wbytes/dt_pl/1e9:6.1f} GB/s)"
          f" | stacked(cycling l) {dt_st*1e6:7.2f} us "
          f"({wbytes/dt_st/1e9:6.1f} GB/s) | ratio {dt_st/dt_pl:.3f}",
          flush=True)

    # ---- C: compile-time / HLO-size scaling, unrolled vs scan ----------
    from gemlite_tpu.helper import A16Wn_HQQ_INT
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
        t0 = time.perf_counter()
        params = quantize_llama(
            init_llama(cfg_m),
            processor=A16Wn_HQQ_INT(W_nbits=4, dtype=jnp.bfloat16),
            group_size=128, iters=1)      # timing probe: 1 refit iter
        stk = stack_blocks(params)
        print(f"C: L={nl} quantize+stack {time.perf_counter()-t0:.1f}s",
              flush=True)
        kv = init_kv_cache(cfg_m, B)
        lens = jnp.full((B,), 17, jnp.int32)
        tok = jnp.zeros((B, 1), jnp.int32)

        # params/stacked are ARGUMENTS and kv is DONATED — the engine's
        # production jit shape (serving.py _decode_jit)
        f_unroll = jax.jit(
            lambda p, t_, kv_, l_: llama_decode_step_batched(
                p, cfg_m, t_, kv_, l_),
            donate_argnums=(2,))
        f_scan = jax.jit(
            lambda p, s_, t_, kv_, l_: llama_decode_step_scan(
                s_, p, cfg_m, t_, kv_, l_),
            donate_argnums=(3,))
        rows = {}
        for name, f, args in (("unroll", f_unroll, (params, tok, kv, lens)),
                              ("scan", f_scan, (params, stk, tok, kv, lens))):
            t0 = time.perf_counter()
            lowered = f.lower(*args)
            hlo_chars = len(lowered.as_text())
            t1 = time.perf_counter()
            compiled = lowered.compile()
            t2 = time.perf_counter()
            kv2 = init_kv_cache(cfg_m, B)   # donation consumes the cache
            a2 = list(args)
            a2[2 if name == "unroll" else 3] = kv2
            lo, kv2 = compiled(*a2)
            rows[name] = np.asarray(lo[:, 0, :8], np.float32)
            # steady-state step: re-feed the returned (donated) cache
            t3 = time.perf_counter()
            for _ in range(20):
                a2[2 if name == "unroll" else 3] = kv2
                lo, kv2 = compiled(*a2)
            jax.block_until_ready(lo)
            dt = (time.perf_counter() - t3) / 20
            print(f"C: L={nl} {name:6s} trace {t1-t0:6.1f}s "
                  f"compile {t2-t1:6.1f}s hlo {hlo_chars/1e6:6.2f} MChar "
                  f"step {dt*1e3:7.3f} ms", flush=True)
        d = float(np.max(np.abs(rows["unroll"] - rows["scan"])))
        print(f"C: L={nl} |logit delta| (first 8 cols) unroll vs scan = "
              f"{d:.4f}", flush=True)


if __name__ == "__main__":
    main()
