# SPDX-License-Identifier: Apache-2.0
"""Probe: cross-k software pipelining of the prefill dequant build (round-5
VERDICT item 4 — the mid-M M=256 experiment).

Hypothesis: at mid M the prefill kernel is bounded by the serialization of
the VPU plane build in front of each k block's MXU dots (CEILING.md). The
n_sub knob already interleaves sub-column builds with dots WITHIN a k step;
this probe pipelines ACROSS k steps with a two-slot VMEM scratch:

    grid = (N/bn, K/bk + 1)          # one extra phase step, m looped inside
    instance k: BUILD block k into slot k%2   (skipped at k == n_k)
                DOT   block k-1 from slot (k-1)%2 over all m rows (skipped
                      at k == 0)

The build of block k and the dots of block k-1 touch different scratch
slots, so Mosaic's static scheduler is free to interleave VPU and MXU ops.
Compared against the production kernel (tuned config) at the same shapes.

Specialized to A16W4 gs=128 mode-4 (pack() default fma-packed zeros — the
BENCH_MATRIX mid-M row family).
Run on TPU: python scripts/probe_midm_pipeline.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_layer(N, K, gs=128):
    import jax.numpy as jnp
    from gemlite_tpu import GemLiteLinear, DType

    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = (rng.uniform(0.5, 1.5, size=(N * K // gs, 1)) * 2.0**-8
              ).astype(np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    W_deq = ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    return layer, W_deq


def pipe_matmul(x, W_q, scales, zeros, meta, bn, bk, build_bf16=True,
                interpret=False):
    """Two-slot cross-k pipelined fused dequant+matmul (W4 mode 3, folded
    layout w_layout=1: natural k order, no x permute)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gemlite_tpu.ops.pallas_decode import MAGIC16, OFFSET

    M, K = x.shape
    N = meta.out_features
    gs = meta.group_size
    n_planes = 4
    c = bk // gs
    t_rows = gs // n_planes
    n_k = K // bk
    n_j = N // bn
    Mp = max(8, M)
    bm = min(Mp, 256)
    n_m = Mp // bm
    cdt = jnp.bfloat16 if build_bf16 else jnp.float32

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, bscr):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        slot = jax.lax.rem(k, 2)

        @pl.when(k < n_k)
        def _():
            w = w_ref[...]
            planes = [
                pltpu.bitcast(((w >> (4 * j)) & 0x000F000F) | MAGIC16,
                              jnp.bfloat16).reshape(c, t_rows, bn)
                for j in range(n_planes)
            ]
            v = jnp.stack(planes, axis=1).reshape(c, gs, bn)
            s3 = s_ref[pl.ds(k * c, c), :].astype(cdt)[:, None, :]
            z3 = z_ref[pl.ds(k * c, c), :].astype(cdt)[:, None, :]
            # pack() default is W_group_mode 4 (fma-packed zeros z' = -z*s):
            # b = (v - OFFSET) * s + z'
            b = (v.astype(cdt) - cdt(OFFSET)) * s3 + z3
            bscr[pl.ds(slot, 1)] = b.astype(jnp.bfloat16).reshape(1, bk, bn)

        @pl.when(k > 0)
        def _():
            prev = jax.lax.rem(k + 1, 2)
            bprev = bscr[pl.ds(prev, 1)].reshape(bk, bn)
            for m in range(n_m):
                acc_ref[m * bm:(m + 1) * bm, :] += jax.lax.dot_general(
                    x_ref[m * bm:(m + 1) * bm, :], bprev,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(k == n_k)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    xq = x.astype(jnp.bfloat16)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    G = scales.shape[0]

    out = pl.pallas_call(
        kernel,
        grid=(n_j, n_k + 1),
        in_specs=[
            # x block at k-1 (the dot phase); clamped at the ends
            pl.BlockSpec((Mp, bk),
                         lambda j, k: (0, jnp.maximum(k - 1, 0)),
                         memory_space=pltpu.VMEM),
            # w block at k (the build phase); clamped at the tail
            pl.BlockSpec((bk // 8, bn),
                         lambda j, k: (jnp.minimum(k, n_k - 1), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((Mp, bn), jnp.float32),
            pltpu.VMEM((2, bk, bn), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, W_q, scales, zeros)
    return out[:M]


def timed_slope(fn, args, n1=50, n2=200, repeats=6):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @partial(jax.jit, static_argnames=())
    def loop(x, rest, n):
        def body(i, xx):
            return x + fn(xx, *rest) * jnp.asarray(1e-30, x.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

    x, rest = args[0], tuple(args[1:])
    float(loop(x, rest, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, rest, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from gemlite_tpu.ops.pallas_prefill import (pallas_prefill_matmul,
                                                select_prefill_config)
    from gemlite_tpu.config import (config_signature, ensure_default_config,
                                    lookup_config)
    from gemlite_tpu.ops.dispatch import autotune_type_id
    from gemlite_tpu.utils import m_bucket
    ensure_default_config()

    M = 256
    sizes = (4096, 8192, 16384)
    if "--M" in sys.argv:
        M = int(sys.argv[sys.argv.index("--M") + 1])
    if "--sizes" in sys.argv:
        sizes = tuple(int(s) for s in
                      sys.argv[sys.argv.index("--sizes") + 1].split(","))
    MXU_TF = 197.0  # v5e bf16 peak
    rng = np.random.default_rng(1)
    for S in sizes:
        N = K = S
        layer, W_deq = build_layer(N, K)
        meta = layer.meta
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)

        want = np.asarray(x, np.float32) @ W_deq.T

        # production kernel at its tuned config
        sig = config_signature(m_bucket.get_closest_m(M), N, K,
                               meta.group_size, meta.elements_per_sample,
                               autotune_type_id(meta))
        cfg = lookup_config("GEMM", sig) or select_prefill_config(
            meta, M, N, K)
        try:
            y0 = pallas_prefill_matmul(x, layer.W_q, layer.scales,
                                       layer.zeros, None, meta, cfg)
            r0 = np.abs(np.asarray(y0, np.float32) - want).mean() / \
                (np.abs(want).mean() + 1e-9)
            dt0 = timed_slope(
                lambda xx, Wq, s, z: pallas_prefill_matmul(
                    xx, Wq, s, z, None, meta, cfg),
                (x, layer.W_q, layer.scales, layer.zeros))
            tf0 = 2 * M * N * K / dt0 / 1e12
            print(f"{S}x{S} M={M} production: {dt0*1e6:.1f} us = {tf0:.1f} TF "
                  f"({100*tf0/MXU_TF:.1f}% MXU)  rel={r0:.1e}  cfg={cfg}",
                  flush=True)
        except Exception as e:
            print(f"{S}x{S} M={M} production: FAIL {str(e)[:90]}", flush=True)
        # whatever dispatch actually routes (at giant M: the measured
        # two-pass dense-fallback pseudo-candidate) — the incumbent
        from gemlite_tpu.core import forward_functional
        dtd = timed_slope(
            lambda xx, Wq, s, z: forward_functional(
                xx, None, [Wq, s, z], meta),
            (x, layer.W_q, layer.scales, layer.zeros))
        tfd = 2 * M * N * K / dtd / 1e12
        print(f"  dispatch-route: {dtd*1e6:.1f} us = {tfd:.1f} TF "
              f"({100*tfd/MXU_TF:.1f}% MXU)", flush=True)

        # pipelined variant over a small (bn, bk) grid
        for bn in (512, 1024, 256):
            for bk in (2048, 4096, 1024):
                if N % bn or K % bk:
                    continue
                try:
                    y1 = pipe_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                     meta, bn, bk)
                    r1 = np.abs(np.asarray(y1, np.float32) - want).mean() / \
                        (np.abs(want).mean() + 1e-9)
                    if r1 > 5e-3:
                        print(f"  pipe bn={bn} bk={bk}: WRONG rel={r1:.2e}",
                              flush=True)
                        continue
                    dt1 = timed_slope(
                        lambda xx, Wq, s, z, bn=bn, bk=bk: pipe_matmul(
                            xx, Wq, s, z, meta, bn, bk),
                        (x, layer.W_q, layer.scales, layer.zeros))
                    tf1 = 2 * M * N * K / dt1 / 1e12
                    print(f"  pipe bn={bn} bk={bk}: {dt1*1e6:.1f} us = "
                          f"{tf1:.1f} TF ({100*tf1/MXU_TF:.1f}% MXU)  "
                          f"rel={r1:.1e}", flush=True)
                except Exception as e:
                    print(f"  pipe bn={bn} bk={bk}: FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
