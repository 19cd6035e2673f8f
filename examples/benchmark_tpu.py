# SPDX-License-Identifier: Apache-2.0
"""Matmul benchmark: fused low-bit kernels vs XLA bf16 dense, per batch size.

TPU counterpart of the reference examples/benchmark_triton.py: correctness
gate first (check_valid, benchmark_triton.py:63-69), then speed-up vs the
framework-native dense matmul across the same batch sweep, plus a roofline
report (achieved weight-stream GB/s vs the chip's HBM bandwidth).

Usage:
  python examples/benchmark_tpu.py [--nbits 4] [--gs 128] [--shape 4096 4096]
"""
import argparse
import _pathfix  # noqa: F401  (source-checkout import path)
import sys
import time

import numpy as np


def timed_slope(fn, x, n1=200, n2=800, repeats=3):
    """Per-call seconds via chained-loop slope (host overhead cancels)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x, n):
        def body(i, c):
            xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
            y = fn(xx)
            # consume the FULL output so XLA cannot dead-code-eliminate
            # columns of a dense matmul baseline
            return jnp.sum(y.astype(jnp.float32)) * 1e-12
        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(x, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


# single source of truth for per-chip rooflines lives in bench.py
from bench import HBM_ROOFLINE_GBPS as HBM_GBPS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--gs", type=int, default=128)
    ap.add_argument("--shape", type=int, nargs=2, default=[4096, 4096],
                    metavar=("N", "K"))
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional

    N, K = args.shape
    gs = args.gs
    nb = args.nbits
    dev = jax.devices()[0].device_kind
    hbm = next((v for k, v in HBM_GBPS.items() if k in dev.lower()), 819.0)
    print(f"# device={dev}  W{nb} gs={gs}  {N}x{K}", flush=True)

    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 2**nb, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
    zeros = rng.integers(0, 2**nb, size=(G, 1)).astype(np.float32)
    W_deq = ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    layer = GemLiteLinear(nb, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    Wd = jnp.asarray(W_deq.T, jnp.bfloat16)

    wbytes = K * N * nb // 8 + (K // gs) * N * 4 * 2

    print(f"{'M':>5} {'fused_us':>9} {'dense_us':>9} {'speedup':>8} "
          f"{'GB/s':>7} {'roofline%':>9}")
    for M in args.batches:
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)

        # correctness gate (reference check_valid)
        y = layer(x)
        err = float(jnp.mean(jnp.abs(
            y.astype(jnp.float32) - x.astype(jnp.float32) @ W_deq.T)))
        scale = float(jnp.mean(jnp.abs(x.astype(jnp.float32) @ W_deq.T)))
        assert err / (scale + 1e-9) < 2e-2, f"M={M}: rel err {err/scale}"

        fused = lambda xx: forward_functional(
            xx, None, layer.get_tensor_args(), layer.meta)
        dense = lambda xx: jnp.dot(xx, Wd, preferred_element_type=jnp.float32)

        t_f = timed_slope(fused, x)
        t_d = timed_slope(dense, x)
        gbps = (wbytes + M * K * 2 + M * N * 2) / t_f / 1e9
        print(f"{M:5d} {t_f*1e6:9.1f} {t_d*1e6:9.1f} {t_d/t_f:8.2f} "
              f"{gbps:7.1f} {100*gbps/hbm:8.1f}%", flush=True)


if __name__ == "__main__":
    main()
