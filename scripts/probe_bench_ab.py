# SPDX-License-Identifier: Apache-2.0
"""Within-session A/B of decode configs through the full library path."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")


def timed(fn, x, n1=300, n2=1200, repeats=6):
    @jax.jit
    def loop(x, n):
        def body(i, xx):
            return x + fn(xx) * jnp.asarray(1e-30, x.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))
    float(loop(x, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.config import KernelConfig
    from gemlite_tpu.ops.pallas_decode import pallas_decode_matmul

    N = K = 4096
    gs = 128
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = np.full((N * K // gs, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(W_q, scales, zeros)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)
    allbytes = K * N // 2 + (K // gs) * N * 4 * 2 + K * 2 + N * 2

    for bn, bk in [(1024, 4096), (1024, 2048), (2048, 1024)] * 3:
        cfg = KernelConfig(block_m=8, block_n=bn, block_k=bk)
        try:
            f = lambda xx, cfg=cfg: pallas_decode_matmul(
                xx, layer.W_q, layer.scales, layer.zeros, None, layer.meta, cfg)
            f(x)
            dt = timed(f, x)
            print(f"bn={bn} bk={bk}: {dt*1e6:7.2f} us  {allbytes/dt/1e9:6.1f} GB/s")
        except Exception as e:
            print(f"bn={bn} bk={bk} FAILED: {str(e)[-150:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
