# SPDX-License-Identifier: Apache-2.0
"""Prefill tail probe 2: resident-x kernel (x block (Mp, bk) indexed by k)."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from scripts.probe_prefill_tail import timed


def main():
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.config import KernelConfig
    from gemlite_tpu.ops.pallas_prefill import (pallas_prefill_matmul,
                                                can_use_prefill_kernel)
    from gemlite_tpu.core import forward_functional

    N = K = 4096
    gs = 128
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = np.full((N * K // gs, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(W_q, scales, zeros)
    Wd = jnp.asarray(rng.normal(size=(K, N)) * 0.01, jnp.bfloat16)
    W_deq = ((W_q.reshape(-1, gs) - np.asarray(zeros)) *
             np.asarray(scales)).reshape(N, K)

    for M in (2048, 4096, 8192):
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
        flops = 2 * M * N * K

        fd = lambda xx: (xx @ Wd).astype(jnp.bfloat16)
        dt = timed(fd, x)
        print(f"M={M} dense XLA        : {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TF")
        sys.stdout.flush()

        for bn, bk, bm in [(512, 4096, 2048), (512, 4096, 1024),
                           (512, 4096, 512), (512, 2048, 1024),
                           (1024, 2048, 1024), (256, 4096, 1024),
                           (512, 4096, 4096)]:
            if bm > M:
                continue
            cfg = KernelConfig(block_m=bm, block_n=bn, block_k=bk)
            if not can_use_prefill_kernel(layer.meta, M, N, K, cfg):
                print(f"M={M} bn={bn} bk={bk} bm={bm}: rejected (VMEM)")
                continue
            try:
                f = lambda xx, cfg=cfg: pallas_prefill_matmul(
                    xx, layer.W_q, layer.scales, layer.zeros, None, layer.meta, cfg)
                y = f(x)
                err = float(jnp.mean(jnp.abs(
                    y[:64].astype(jnp.float32)
                    - np.asarray(x[:64], np.float32) @ W_deq.T)))
                dt = timed(f, x)
                print(f"M={M} bn={bn} bk={bk} bm={bm}: {dt*1e6:8.1f} us  "
                      f"{flops/dt/1e12:6.1f} TF (err {err:.1e})")
            except Exception as e:
                print(f"M={M} bn={bn} bk={bk} bm={bm} FAILED: {str(e)[-120:]}")
            sys.stdout.flush()

        # the full dispatch path (auto config + chunking for M=8192)
        fauto = lambda xx: forward_functional(xx, None, layer.get_tensor_args(),
                                              layer.meta)
        fauto(x)
        dt = timed(fauto, x)
        print(f"M={M} dispatch auto    : {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TF")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
