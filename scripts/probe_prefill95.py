# SPDX-License-Identifier: Apache-2.0
"""Probe: prefill M>=2048 tail vs dense — build_bf16 / n_sub knob sweep.

Interleaved A/B within one process (cross-process rankings contradict each
other through the tunnel; see probe_bench_ab.py). A16W4 gs=128 4096^2.

Run: env PYTHONPATH=$PYTHONPATH:/root/repo python scripts/probe_prefill95.py [M ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.config import KernelConfig
    from gemlite_tpu.ops.pallas_prefill import (
        pallas_prefill_matmul, can_use_prefill_kernel, select_prefill_config)
    from gemlite_tpu.ops.dispatch import _dense_fallback_matmul

    N = K = 4096
    gs = 128
    Ms = [int(a) for a in sys.argv[1:]] or [2048, 4096]

    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = np.full((G, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(G, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    meta = layer.meta
    Wd = jnp.asarray(
        ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K).T,
        jnp.bfloat16)

    def timed(fn, x, n1=20, n2=80, reps=6):
        @jax.jit
        def loop(x, n):
            def body(i, xx):
                y = fn(xx)
                # N == K: feed output back (residual-style dependency)
                return x + y * jnp.asarray(1e-30, x.dtype)
            return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))
        float(loop(x, n2))
        best = {}
        for n in (n1, n2) * reps:
            t0 = time.perf_counter()
            float(loop(x, n))
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
        return (best[n2] - best[n1]) / (n2 - n1)

    for M in Ms:
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
        base = select_prefill_config(meta, M, N, K)
        variants = {"dense": lambda xx: (xx @ Wd),
                    "fallback": lambda xx: _dense_fallback_matmul(
                        xx, layer.W_q, layer.scales, layer.zeros, None, meta)}
        for bk in (base.block_k, 2048, 1024):
            for bn in (base.block_n, 1024):
                for bf16 in (False, True):
                    for ns in (1, 2, 4):
                        cfg = KernelConfig(base.block_m, bn, bk,
                                           build_bf16=bf16, n_sub=ns)
                        if not can_use_prefill_kernel(meta, M, N, K, cfg):
                            continue
                        tag = f"bk={bk},bn={bn},bf16={int(bf16)},n_sub={ns}"
                        if tag in variants:
                            continue
                        variants[tag] = (lambda cfg: lambda xx:
                                         pallas_prefill_matmul(
                                             xx, layer.W_q, layer.scales,
                                             layer.zeros, None, meta,
                                             cfg))(cfg)
        # chunked 2x2048 for M=4096
        if M == 4096:
            ccfg = select_prefill_config(meta, 2048, N, K)
            def chunked(xx, ccfg=ccfg):
                outs = [pallas_prefill_matmul(
                    xx[i:i + 2048], layer.W_q, layer.scales, layer.zeros,
                    None, meta, ccfg) for i in (0, 2048)]
                return jnp.concatenate(outs, axis=0)
            variants["chunk2x2048"] = chunked
            def chunked_ns(xx, ccfg=KernelConfig(
                    ccfg.block_m, ccfg.block_n, ccfg.block_k, n_sub=2)):
                outs = [pallas_prefill_matmul(
                    xx[i:i + 2048], layer.W_q, layer.scales, layer.zeros,
                    None, meta, ccfg) for i in (0, 2048)]
                return jnp.concatenate(outs, axis=0)
            variants["chunk2x2048,n_sub=2"] = chunked_ns

        print(f"== M={M} ==", flush=True)
        results = {}
        for name, fn in variants.items():
            try:
                dt = timed(fn, x)
            except Exception as e:
                print(f"  {name:>24}: FAILED {str(e)[:120]}", flush=True)
                continue
            tf = 2 * M * N * K / dt / 1e12
            results[name] = dt
            print(f"  {name:>24}: {dt*1e6:8.1f} us  {tf:6.1f} TF", flush=True)
        if "dense" in results:
            d = results["dense"]
            for name, dt in results.items():
                if name != "dense":
                    print(f"  {name:>24}: {d/dt:5.3f}x dense", flush=True)


if __name__ == "__main__":
    main()
