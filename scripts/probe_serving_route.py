# SPDX-License-Identifier: Apache-2.0
"""On-chip A/B: the quantize_llama meta-dtype routing fix.

quantize_llama's old default processor inferred input_dtype=FP32 from the
float32 scale arrays, which fails the decode/prefill kernels' 2-byte
activation gate (pallas_decode.can_use_decode_kernel) and silently routed
EVERY model linear — including the committed SERVING.md engine runs —
through the dense-fallback oracle. The new default (dtype=bf16, matching
the model's activation dtype and the reference's store-scales-in-model-
dtype convention) routes the same layers through the plane raw-dot
decode kernel / dequant-once prefill kernel.

This probe times forward_functional for both metas at the Llama-8B
serving shapes (gs=64, the serving driver's configuration) and the
batched-decode M=32 the engine issues at 32 slots.

Run: python scripts/probe_serving_route.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, n=30):
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

    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.ops import dispatch

    gs = 64
    rng = np.random.default_rng(0)
    shapes = [(4096, 4096), (14336, 4096), (4096, 14336)]
    for M in (1, 32):
        for N, K in shapes:
            W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
            scales = (rng.uniform(0.5, 1.5, size=(N * K // gs, 1))
                      * 2.0 ** -8).astype(np.float32)
            zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
            x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
            rows = {}
            for tag, idt in (("fp32-meta(old)", DType.FP32),
                             ("bf16-meta(new)", DType.BF16)):
                layer = GemLiteLinear(4, gs, K, N, idt, idt).pack(
                    W_q, scales, zeros)
                meta, tensors = layer.meta, tuple(layer.get_tensor_args())
                xin = x.astype(jnp.float32) if idt == DType.FP32 else x
                dispatch.KERNEL_TRACE.clear()
                f = jax.jit(lambda xx, *tt: forward_functional(
                    xx, None, list(tt), meta))
                out = f(xin, *tensors)
                route = dispatch.KERNEL_TRACE[-1] if dispatch.KERNEL_TRACE \
                    else "?"
                dt = timed(lambda: f(xin, *tensors))
                rows[tag] = (dt, route, out)
            (dt_o, r_o, out_o), (dt_n, r_n, out_n) = \
                rows["fp32-meta(old)"], rows["bf16-meta(new)"]
            d = float(jnp.max(jnp.abs(out_o.astype(jnp.float32)
                                      - out_n.astype(jnp.float32))))
            wbytes = np.asarray(GemLiteLinear(4, gs, K, N, DType.BF16,
                                              DType.BF16).pack(
                W_q, scales, zeros).W_q).nbytes
            print(f"M={M:<3d} {N}x{K}: old[{r_o:13s}] {dt_o*1e6:8.2f} us | "
                  f"new[{r_n:13s}] {dt_n*1e6:8.2f} us "
                  f"({wbytes/dt_n/1e9:6.1f} GB/s) | speedup "
                  f"{dt_o/dt_n:5.2f}x | max|d| {d:.3f}", flush=True)


if __name__ == "__main__":
    main()
