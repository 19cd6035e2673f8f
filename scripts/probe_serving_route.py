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

Timing is DEVICE-SIDE (jitted fori_loop, n vs 4n slope) so the dev
tunnel's ~1 ms per-dispatch RTT cancels — a first version timed
dispatch walls and bottomed out at the RTT for every fast row.

Shapes: the Llama-8B serving projections at the serving driver's gs=64,
M=1 (single-slot decode) and M=32 (the engine's 32-slot batched decode);
a gs=128 row anchors against BENCH_MATRIX tuning.

Run: python scripts/probe_serving_route.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_device(fn_loop, n1=200, repeats=5):
    float(fn_loop(4 * n1))
    best = {}
    for n in (n1, 4 * n1) * repeats:
        t0 = time.perf_counter()
        float(fn_loop(n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[4 * n1] - best[n1]) / (3 * n1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.ops import dispatch

    rng = np.random.default_rng(0)
    cases = [(4096, 4096, 64), (14336, 4096, 64), (4096, 14336, 64),
             (4096, 4096, 128)]
    for M in (1, 32):
        for N, K, gs in cases:
            W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
            scales = (rng.uniform(0.5, 1.5, size=(N * K // gs, 1))
                      * 2.0 ** -8).astype(np.float32)
            zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
            x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
            rows = {}
            for tag, idt in (("old", DType.FP32), ("new", DType.BF16)):
                layer = GemLiteLinear(4, gs, K, N, idt, idt).pack(
                    W_q, scales, zeros)
                meta, tensors = layer.meta, tuple(layer.get_tensor_args())
                xin = x.astype(jnp.float32) if idt == DType.FP32 else x
                dispatch.KERNEL_TRACE.clear()
                jax.jit(lambda xx, *tt: forward_functional(
                    xx, None, list(tt), meta)).lower(xin, *tensors)
                route = dispatch.KERNEL_TRACE[-1] if dispatch.KERNEL_TRACE \
                    else "?"

                @jax.jit
                def loop(x0, n, tt=tensors, meta=meta):
                    def body(i, xx):
                        y = forward_functional(xx, None, list(tt), meta)
                        return xx + (jnp.sum(y.astype(jnp.float32)) * 1e-30
                                     ).astype(xx.dtype)
                    return jnp.sum(lax.fori_loop(0, n, body, x0).astype(
                        jnp.float32))

                n1 = 50 if tag == "old" else 200
                dt = timed_device(lambda n: loop(xin, n), n1=n1)
                rows[tag] = (dt, route)
            (dt_o, r_o), (dt_n, r_n) = rows["old"], rows["new"]
            wbytes = N * K // 2
            print(f"M={M:<3d} {N}x{K} gs={gs:<3d}: "
                  f"old[{r_o:12s}] {dt_o*1e6:8.2f} us | "
                  f"new[{r_n:12s}] {dt_n*1e6:8.2f} us "
                  f"({wbytes/dt_n/1e9:6.1f} GB/s) | speedup "
                  f"{dt_o/dt_n:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
