# SPDX-License-Identifier: Apache-2.0
"""Probe: attribute the MXFP8 M=256 prefill gap (73.6% of MXU vs W4
gs=128's 79%). Hypothesis: the residual is the GROUP-SIZE budget (gs=32
means 4x the scale rows and 4x the per-group scale-apply work in the
build), not the fp8 codec (its scaled build is 3 ops/pair, same class as
the int path's magic-bitcast build).

Times at 4096^2 M=256, one session:
  W4  gs=128 (BENCH_MATRIX row — the 79% anchor)
  W4  gs=32  (same int codec, MXFP8's group budget)
  W8  gs=K   (byte-plane build, scale-free: the no-meta upper bound)
  MXFP8 gs=32 (the row under test)

If W4-gs=32 lands at ~MXFP8's fraction, the gap is the group size — a
format property shared with the reference (MX formats ARE gs=32) — and
73-74% is parity for the budget.

Run on TPU: python scripts/probe_mxfp8_gap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MXU = 197.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune

    N = K = 4096
    M = 256
    rng = np.random.default_rng(0)

    def timed(meta, tensors, x, n1=100, repeats=6):
        @jax.jit
        def loop(x, tt, n):
            def body(i, xx):
                y = forward_functional(xx, None, list(tt), meta)
                return x + (jnp.sum(y.astype(jnp.float32))
                            * 1e-30).astype(x.dtype)
            return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

        float(loop(x, tensors, 4 * n1))
        dt = None
        for _ in range(3):
            best = {}
            for n in (n1, 4 * n1) * repeats:
                t0 = time.perf_counter()
                float(loop(x, tensors, n))
                best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
            dt = (best[4 * n1] - best[n1]) / (3 * n1)
            if 3 * n1 * max(dt, 0) >= 0.03 and \
                    2 * M * N * K / max(dt, 1e-9) / 1e12 < 1.05 * MXU:
                break
            n1 = min(n1 * 4, 20000)
        return dt

    def pack_int(nbits, gs):
        W_q = rng.integers(0, 2 ** nbits, size=(N, K)).astype(np.uint8)
        gse = gs or K
        G = N * K // gse
        scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0 ** -8
                  ).astype(np.float32)
        zeros = rng.integers(0, 2 ** nbits, size=(G, 1)).astype(np.float32)
        return GemLiteLinear(nbits, gse, K, N, DType.BF16, DType.BF16).pack(
            W_q, scales, zeros)

    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    cases = [("W4 gs=128", pack_int(4, 128)),
             ("W4 gs=32", pack_int(4, 32)),
             ("W8 gs=K (no groups)", pack_int(8, None)),
             ("MXFP8 gs=32",
              mxfp_quantize_layer_for_autotune(N, K, DType.MXFP8, rng))]
    for label, lay in cases:
        dt = timed(lay.meta, tuple(lay.get_tensor_args()), x)
        tf = 2 * M * N * K / dt / 1e12
        print(f"{label:22s} M={M}: {dt*1e6:8.2f} us  {tf:6.1f} TF  "
              f"({100*tf/MXU:.1f}% MXU)", flush=True)


if __name__ == "__main__":
    main()
