# SPDX-License-Identifier: Apache-2.0
"""Probe: what binds the W4 decode kernel in the M in (1, 64] band?
(round-5 VERDICT item 5 — the batched-decode dip at 4096^2.)

Fresh-session measurements show M=1 at ~90% of the HBM roofline but
M=16/32/64 at 53-67%. Candidate explanations, each timed here at 4096^2:

  stream  — pure DMA read of the packed array (the bandwidth floor)
  mxu     — pure batched group dots, SAME shapes as the decode kernel but
            pre-built bf16 planes (no unpack, no correction): the MXU
            row-utilization floor (an (M, gs) LHS feeds only M of the MXU's
            128 rows; if Mosaic cannot pack group-batches into one pass,
            every M <= 128 pays a constant ~2*128*N*K/peak)
  flat    — ONE (M, K) x (K, bn) dot per j block (no group batching):
            does a deeper single dot recover MXU rows?
  decode  — the production decode kernel (unpack + dots + correction)
  prefill — the production prefill kernel routed at this M (dequant-once
            cache + whole-M dot)

Run on TPU: python scripts/probe_midm_decode_floor.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, args, n1, repeats=6, min_delta=0.03):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x, rest, n):
        def body(i, xx):
            y = fn(xx, *rest)
            # scalar data-dependence (output shape may differ from input)
            return x + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))

    x, rest = args[0], tuple(args[1:])
    float(loop(x, rest, 4 * n1))
    dt = None
    for _ in range(3):
        best = {}
        for n in (n1, 4 * n1) * repeats:
            t0 = time.perf_counter()
            float(loop(x, rest, n))
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
        dt = (best[4 * n1] - best[n1]) / (3 * n1)
        if 3 * n1 * max(dt, 0) >= min_delta:
            break
        n1 = min(n1 * 4, 40000)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.ops.pallas_prefill import (pallas_prefill_matmul,
                                                select_prefill_config)

    N = K = 4096
    gs = 128
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = (rng.uniform(0.5, 1.5, size=(N * K // gs, 1)) * 2.0 ** -8
              ).astype(np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    meta = layer.meta
    tensors = tuple(layer.get_tensor_args())
    wbytes = np.asarray(layer.W_q).nbytes

    # pre-built dense bf16 weights for the MXU-floor kernels — generated ON
    # DEVICE (a 33-64 MB host upload through the dev tunnel can take tens of
    # minutes and wedged two prior runs of this probe)
    Wd = jax.jit(lambda k: (jax.random.normal(k, (K, N), jnp.float32)
                            * 0.02).astype(jnp.bfloat16))(
        jax.random.PRNGKey(0))

    def make_mxu_batched(M, bn=512, bk=1024, resident=False):
        """c batched (M, gs) x (gs, bn) dots per (j, k) block — the decode
        kernel's dot shape with zero build/correction work. ``resident``
        pins the weight index map to one block (DMA'd once), isolating the
        MXU pass time from the dense array's 4x stream cost."""
        c = bk // gs
        wmap = (lambda j, k: (0, 0)) if resident else (lambda j, k: (k, j))

        def kern(x_ref, w_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            w3 = w_ref[...].reshape(c, gs, bn)
            raw = jax.lax.dot_general(
                x_ref[...], w3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc[...] += jnp.sum(raw, axis=0)

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        def run(x3):
            return pl.pallas_call(
                kern,
                grid=(N // bn, K // bk),
                in_specs=[pl.BlockSpec((K // gs // (K // bk), M, gs),
                                       lambda j, k: (k, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((bk, bn), wmap,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x3, Wd)
        return run

    def make_mxu_flat(M, bn=512, bk=1024, resident=False):
        wmap = (lambda j, k: (0, 0)) if resident else (lambda j, k: (k, j))
        def kern(x_ref, w_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            acc[...] += jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        def run(x2):
            return pl.pallas_call(
                kern,
                grid=(N // bn, K // bk),
                in_specs=[pl.BlockSpec((M, bk), lambda j, k: (0, k),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((bk, bn), wmap,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((M, bn), lambda j, k: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x2, Wd)
        return run

    print(f"W4 gs=128 {N}x{K}: packed {wbytes/1e6:.1f} MB; "
          f"stream floor @819GB/s = {wbytes/819e9*1e6:.1f} us; "
          f"dense bf16 2-byte stream = {K*N*2/819e9*1e6:.1f} us", flush=True)
    for M in (1, 8, 16, 32, 64):
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
        x3 = x.reshape(M, K // gs, gs).transpose(1, 0, 2)  # (c_tot, M, gs)

        dt_dec = timed(lambda xx, *tt: forward_functional(
            xx, None, list(tt), meta), (x,) + tensors, 400)
        dt_bat = timed(make_mxu_batched(M, resident=True), (x3,), 400)
        dt_flat = timed(make_mxu_flat(M, resident=True), (x,), 400)
        cfg = select_prefill_config(meta, M, N, K)
        try:
            dt_pre = timed(lambda xx, *tt: pallas_prefill_matmul(
                xx, tt[0], tt[1], tt[2], None, meta, cfg), (x,) + tensors, 200)
        except Exception as e:
            dt_pre = float("nan")
            print(f"  prefill route failed: {str(e)[:80]}", flush=True)
        print(f"M={M:<3d} decode {dt_dec*1e6:7.2f} us ({wbytes/dt_dec/1e9:6.1f} GB/s) | "
              f"mxu-batched {dt_bat*1e6:7.2f} | mxu-flat {dt_flat*1e6:7.2f} | "
              f"prefill-route {dt_pre*1e6:7.2f}", flush=True)


if __name__ == "__main__":
    main()
