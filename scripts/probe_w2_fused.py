# SPDX-License-Identifier: Apache-2.0
"""Probe: how much of the W2 decode per-call overhead does projection
fusion recover?

probe_w2_floor.py established sub-nibble decode is VPU-op-bound (~constant
time per VALUE, so GB/s halves with the bit width). Fusion does not change
ops/value, but it DOES amortize the fixed per-call cost (grid setup, x and
meta streams, epilogue) over 2-3x the output columns — one wqkv call
(N=12288) instead of three N=4096 calls, one gate_up call instead of two
(models/llama.py quantize_llama(fuse=True)).

Measures, at K=4096 gs=128 M=1 on the real chip:
  W2 N=4096           - per-projection baseline (x3 for unfused qkv cost)
  W2 N=8192           - fused gate-up shape
  W2 N=12288          - fused qkv shape
  W4 N=12288          - control (nibble path, same fused shape)

Reports us/call, effective GB/s, and the implied per-call fixed cost from
the (N=12288 vs 3x N=4096) difference. Paste into CEILING.md's W2 section.

Usage: python scripts/probe_w2_fused.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np
    import jax.numpy as jnp
    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.core import forward_functional
    from bench import timed_slopes

    quick = "--quick" in sys.argv
    n1, n2 = (100, 400) if quick else (200, 800)
    K = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    fns, meta_bytes = {}, {}
    for nb, N in ((2, 4096), (2, 8192), (2, 12288), (4, 12288)):
        W_q = rng.integers(0, 2 ** nb, size=(N, K)).astype(np.uint8)
        G = N * K // 128
        scales = (2.0 ** rng.integers(-10, -6, (G, 1))).astype(np.float32)
        zeros = rng.integers(0, 2 ** nb, (G, 1)).astype(np.float32)
        lay = GemLiteLinear(nb, 128, K, N, DType.BF16, DType.BF16).pack(
            W_q, scales, zeros)
        meta = lay.meta
        tensors = tuple(lay.get_tensor_args())

        def run(xx, meta=meta, tensors=tensors):
            # slice back to K columns: timed_slopes chains x + fn(x), which
            # needs an x-shaped result; the Pallas call is opaque so the
            # slice cannot DCE any kernel work
            return forward_functional(xx, None, list(tensors), meta)[:, :K]

        jax.block_until_ready(jax.jit(run)(x))
        fns[f"W{nb} N={N}"] = (jax.jit(run), x)
        meta_bytes[f"W{nb} N={N}"] = (K * N * nb // 8 + G * 8 + K * 2 + N * 2)

    dts = timed_slopes(fns, n1, n2)
    print(f"{'variant':<14s} {'time':>9s} {'GB/s':>8s}  bytes")
    for v, dt in dts.items():
        nb = meta_bytes[v]
        print(f"{v:<14s} {dt*1e6:8.2f}us {nb/dt/1e9:7.1f}  {nb/1e6:.1f} MB",
              flush=True)
    t1, t3 = dts["W2 N=4096"], dts["W2 N=12288"]
    print(f"\nunfused qkv (3 calls): {3*t1*1e6:8.2f}us"
          f"   fused qkv (1 call): {t3*1e6:8.2f}us"
          f"   saved: {(3*t1-t3)*1e6:6.2f}us"
          f" ({100*(3*t1-t3)/(3*t1):.0f}%)", flush=True)
    print(f"implied per-call fixed cost ~ {(3*t1-t3)/2*1e6:.2f}us", flush=True)


if __name__ == "__main__":
    main()
