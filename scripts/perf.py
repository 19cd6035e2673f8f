# SPDX-License-Identifier: Apache-2.0
"""Parameterized single-op perf tool (consolidates the round-1 perf_probe*
scratch scripts).

Times the full dispatch path (or a forced kernel config) for one quantized
layer shape with robust chained-loop slope timing, and reports achieved GB/s
(decode) or TF (prefill) vs the roofline.

Examples:
  python scripts/perf.py --N 4096 --K 4096 --W 4 --gs 128 --M 1
  python scripts/perf.py --M 512 --bn 512 --bk 4096 --bm 512
  python scripts/perf.py --mx mxfp4 --M 1
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x, n1, n2, repeats=4):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x, n):
        def body(i, xx):
            y = fn(xx)
            return x + (y.astype(jnp.float32).ravel()[0] * 1e-30).astype(x.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

    float(loop(x, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--W", type=int, default=4)
    ap.add_argument("--gs", type=int, default=128)
    ap.add_argument("--M", type=int, default=1)
    ap.add_argument("--mx", choices=["mxfp4", "nvfp4", "mxfp8"], default=None)
    ap.add_argument("--bn", type=int, default=0)
    ap.add_argument("--bk", type=int, default=0)
    ap.add_argument("--bm", type=int, default=0)
    ap.add_argument("--n1", type=int, default=0, help="short loop length")
    ap.add_argument("--n2", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.config import KernelConfig, store_config, config_signature
    from gemlite_tpu.utils import m_bucket
    from gemlite_tpu.ops.dispatch import autotune_type_id
    from gemlite_tpu.core import get_matmul_type
    from gemlite_tpu.dtypes import is_mx_dtype

    N, K, M = args.N, args.K, args.M
    rng = np.random.default_rng(0)
    if args.mx:
        from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune
        d = {"mxfp4": DType.MXFP4, "nvfp4": DType.NVFP4,
             "mxfp8": DType.MXFP8}[args.mx]
        layer = mxfp_quantize_layer_for_autotune(N, K, d, rng)
    else:
        W_q = rng.integers(0, 2**args.W, size=(N, K)).astype(np.uint8)
        G = N * K // args.gs
        scales = (rng.uniform(0.5, 1.5, (G, 1)) * 2.0**-8).astype(np.float32)
        zeros = rng.integers(0, 2**args.W, (G, 1)).astype(np.float32)
        layer = GemLiteLinear(args.W, args.gs, K, N, DType.BF16,
                              DType.BF16).pack(W_q, scales, zeros)

    meta = layer.meta
    if args.bn and args.bk:
        fam = get_matmul_type(M, meta.W_nbits, is_mx_dtype(meta.input_dtype))
        sig = config_signature(m_bucket.get_closest_m(M), N, K,
                               meta.group_size, meta.elements_per_sample,
                               autotune_type_id(meta))
        store_config(fam, sig, KernelConfig(args.bm or min(max(M, 8), 2048),
                                            args.bn, args.bk))

    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    fn = lambda xx: forward_functional(xx, None, layer.get_tensor_args(), meta)
    fn(x)
    n1 = args.n1 or (300 if M <= 64 else 30)
    n2 = args.n2 or 4 * n1
    dt = timed(fn, x, n1, n2)

    elems = meta.elements_per_sample
    meta_b = 0 if layer.scales is None else np.asarray(layer.scales).nbytes
    meta_b += 0 if layer.zeros is None else np.asarray(layer.zeros).nbytes
    wbytes = np.asarray(layer.W_q).nbytes + meta_b + x.nbytes + M * N * 2
    flops = 2 * M * N * K
    print(f"M={M} N={N} K={K} W{meta.W_nbits} gs={meta.group_size}: "
          f"{dt*1e6:.2f} us | {wbytes/dt/1e9:.1f} GB/s | {flops/dt/1e12:.2f} TF")


if __name__ == "__main__":
    main()
