# SPDX-License-Identifier: Apache-2.0
"""Prefill M>=2048 tail probe: block variants vs dispatch-level M-chunking.

M=1024 runs at ~97% of XLA dense; the M=2048 single call drops to ~82%
(full-M accumulator forces big x blocks + wide acc). If two M=1024 calls in
sequence beat one M=2048 call, the fix is a dispatch-level chunk loop, not a
new kernel.
"""
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


def timed(fn, x, n1=30, n2=120, repeats=4):
    @jax.jit
    def loop(x, n):
        def body(i, xx):
            return x + fn(xx)[:, :x.shape[1]] * jnp.asarray(1e-30, x.dtype)
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
    from gemlite_tpu.config import KernelConfig
    from gemlite_tpu.ops.pallas_prefill import pallas_prefill_matmul

    N = K = 4096
    gs = 128
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = np.full((N * K // gs, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(W_q, scales, zeros)
    Wd = jnp.asarray(rng.normal(size=(K, N)) * 0.01, jnp.bfloat16)

    for M in (2048, 4096):
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
        flops = 2 * M * N * K

        fd = lambda xx: (xx @ Wd).astype(jnp.bfloat16)
        dt = timed(fd, x)
        print(f"M={M} dense XLA        : {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TF")
        sys.stdout.flush()

        for bn, bk, bm in [(512, 4096, 2048), (512, 2048, 2048),
                           (1024, 4096, 2048), (1024, 2048, 2048),
                           (512, 4096, 1024), (256, 4096, 2048)]:
            if bm > M:
                continue
            cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
            try:
                f = lambda xx, cfg=cfg: pallas_prefill_matmul(
                    xx, layer.W_q, layer.scales, layer.zeros, None, layer.meta, cfg)
                f(x)
                dt = timed(f, x)
                print(f"M={M} bn={bn} bk={bk} bm={bm}: {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TF")
            except Exception as e:
                print(f"M={M} bn={bn} bk={bk} bm={bm} FAILED: {str(e)[-120:]}")
            sys.stdout.flush()

        for C in (1024, 512):
            cfg = KernelConfig(block_m=C, block_n=512, block_k=4096)
            def fc(xx, C=C, cfg=cfg):
                outs = [pallas_prefill_matmul(xx[i:i + C], layer.W_q,
                                              layer.scales, layer.zeros, None,
                                              layer.meta, cfg)
                        for i in range(0, M, C)]
                return jnp.concatenate(outs, axis=0)
            try:
                fc(x)
                dt = timed(fc, x)
                print(f"M={M} chunked C={C}     : {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TF")
            except Exception as e:
                print(f"M={M} chunked C={C} FAILED: {str(e)[-120:]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
