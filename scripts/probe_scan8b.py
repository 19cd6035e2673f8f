# SPDX-License-Identifier: Apache-2.0
"""On-chip: compile + run the SCANNED Llama-8B decode program.

ROADMAP "engine program compile time": the unrolled 32-layer 8B serving
decode program takes 30-60 min to compile through this environment's
proxied compiler (measured across the round-5 SERVING.md sessions; each
engine variant paid it). This probe compiles the scan-over-layers decode
step (models/scan_llama + the scalar-prefetch stacked kernel) at the
full Llama-8B geometry and 32 slots, and reports:

  * trace + compile wall (the claim: minutes, not tens of minutes),
  * HLO size,
  * steady-state step time (host wall, includes the tunnel's ~1 ms
    dispatch RTT) and the device-side step slope via a 2-point trip
    count, -> implied engine decode tok/s at 32 slots.

Weights are random packed words generated on-device (examples/
llama8b_bench.build_quantized_llama) — bandwidth/compile behavior only
depends on shapes and dtypes.

Run: python scripts/probe_scan8b.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llama8b_bench import build_quantized_llama
    from gemlite_tpu.models import LlamaConfig
    from gemlite_tpu.models.llama import init_kv_cache
    from gemlite_tpu.models.scan_llama import (stack_blocks,
                                               llama_decode_step_scan)

    B = 32
    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=32,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=512)
    t0 = time.perf_counter()
    params = build_quantized_llama(cfg, W_nbits=4, group_size=128)
    print(f"build {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    stk = stack_blocks(params)
    jax.block_until_ready(stk["attn"]["wq"].W_q)
    print(f"stack {time.perf_counter()-t0:.0f}s", flush=True)

    kv = init_kv_cache(cfg, B)
    lens = jnp.full((B,), 64, jnp.int32)
    tok = jnp.zeros((B, 1), jnp.int32)

    f = jax.jit(
        lambda p, s_, t_, kv_, l_: llama_decode_step_scan(
            s_, p, cfg, t_, kv_, l_, t_active=256),
        donate_argnums=(3,))
    t0 = time.perf_counter()
    lowered = f.lower(params, stk, tok, kv, lens)
    hlo = len(lowered.as_text())
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"8B scan decode: trace {t1-t0:.1f}s  COMPILE {t2-t1:.1f}s  "
          f"hlo {hlo/1e6:.2f} MChar", flush=True)

    lo, kv = compiled(params, stk, tok, kv, lens)
    jax.block_until_ready(lo)
    # steady state: re-feed the donated cache; lens fixed (t_active static)
    for reps in (10, 40):
        t0 = time.perf_counter()
        for _ in range(reps):
            lo, kv = compiled(params, stk, tok, kv, lens)
        jax.block_until_ready(lo)
        dt = (time.perf_counter() - t0) / reps
        print(f"step wall ({reps} reps) {dt*1e3:.2f} ms  "
              f"-> {B/dt:.0f} tok/s at {B} slots", flush=True)
    # 2-point slope removes the per-dispatch RTT share
    import statistics
    times = {}
    for reps in (10, 40):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                lo, kv = compiled(params, stk, tok, kv, lens)
            jax.block_until_ready(lo)
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    slope = (times[40] - times[10]) / 30
    print(f"device-side step slope {slope*1e3:.2f} ms -> "
          f"{B/slope:.0f} tok/s at {B} slots", flush=True)


if __name__ == "__main__":
    main()
