# SPDX-License-Identifier: Apache-2.0
"""Streaming-ceiling A/B: what is this chip's achievable HBM read rate, and
does the fused decode kernel reach it?

Cases (identical slope-timing harness, same session — tunnel noise cancels
in the ratios):
  xla_sum        - XLA full-array reduction of the same byte volume
  flat_stream    - Pallas grid streaming a fully-CONTIGUOUS int32 array
  blocked_stream - Pallas streaming the kernel's actual (K/8, N) layout in
                   (bk/8, bn) blocks (rows contiguous, row-strided) - the
                   DMA pattern the fused kernel pays for
  tiled_stream   - same bytes pre-tiled block-major (each grid step reads
                   one contiguous chunk) - tests whether layout (w_layout=2)
                   would raise the rate
  fused          - the real decode kernel (A16W4 gs=128 4096^2 M=1)

Usage: python scripts/probe_ceiling.py [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")
    from bench import timed_slope

    quick = "--quick" in sys.argv
    n1, n2 = (200, 800) if quick else (400, 1600)

    rng = np.random.default_rng(0)
    N = K = 4096
    gs = 128

    results = {}

    def report(name, dt, nbytes):
        gbps = nbytes / dt / 1e9
        results[name] = gbps
        print(f"{name:<22s} {dt*1e6:8.2f} us  {gbps:7.1f} GB/s", flush=True)

    # --- XLA reduction over the same byte volume (8.4 MB int32) -----------
    A = jnp.asarray(rng.integers(-2**30, 2**30, size=(K // 8 * N,)), jnp.int32)
    f = lambda xx: (jnp.sum(A, dtype=jnp.int32)[None] + xx[:1]).astype(jnp.bfloat16)
    xs = jnp.zeros((8,), jnp.bfloat16)
    dt = timed_slope(lambda xx: f(xx), xs, n1, n2)
    report("xla_sum", dt, A.size * 4)

    # --- Pallas streaming kernels ----------------------------------------
    def make_stream(arr, grid, in_spec):
        def kern(x_ref, w_ref, o_ref, acc):
            step = pl.program_id(0) if len(grid) == 1 else pl.program_id(1)
            last = (pl.num_programs(0) - 1 if len(grid) == 1
                    else pl.num_programs(1) - 1)
            @pl.when(step == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            # (no bf16 scalar extracts in Mosaic: reduce x as a vector)
            acc[...] += jnp.sum(w_ref[...]).astype(jnp.float32) + \
                jnp.sum(x_ref[...].astype(jnp.float32))
            @pl.when(step == last)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        def run(xx):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec((1, 128), lambda *a: (0, 0),
                                       memory_space=pltpu.VMEM), in_spec],
                out_specs=pl.BlockSpec((8, 128), lambda *a: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * len(grid),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xx, arr)[:1, :1].reshape(1, 1)
        return run

    x1 = jnp.zeros((1, 128), jnp.bfloat16)
    nbytes = (K // 8) * N * 4

    # flat contiguous: (16384, 1024) int32, blocks (2048, 1024) = 8 MB/8 steps
    flat = jnp.asarray(
        rng.integers(-2**30, 2**30, size=(16384, 1024)), jnp.int32)
    run = make_stream(flat, (8,),
                      pl.BlockSpec((2048, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
    fdt = timed_slope(run, x1, n1, n2)
    report("flat_stream", fdt, flat.size * 4)

    # blocked (the kernel's real layout): (512, 4096) int32, blocks (128, 2048)
    W2d = jnp.asarray(rng.integers(-2**30, 2**30, size=(K // 8, N)), jnp.int32)
    for bn, bk in [(2048, 1024), (1024, 2048), (2048, 2048), (4096, 1024),
                   (4096, 512)]:
        grid = (N // bn, K // bk)
        run = make_stream(
            W2d, grid,
            pl.BlockSpec((bk // 8, bn),
                         lambda j, k: (k, j), memory_space=pltpu.VMEM))
        dt = timed_slope(run, x1, n1, n2)
        report(f"blocked_{bn}x{bk}", dt, nbytes)

    # pre-tiled block-major: (steps, bk/8, bn) contiguous per step
    for bn, bk in [(2048, 1024), (2048, 2048)]:
        steps = (N // bn) * (K // bk)
        tiled = jnp.asarray(rng.integers(-2**30, 2**30,
                                         size=(steps, bk // 8, bn)), jnp.int32)
        run = make_stream(
            tiled, (steps,),
            pl.BlockSpec((1, bk // 8, bn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        dt = timed_slope(run, x1, n1, n2)
        report(f"tiled_{bn}x{bk}", dt, tiled.size * 4)

    # --- the real fused kernel -------------------------------------------
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional

    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = np.full((N * K // gs, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(N * K // gs, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    xm = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)
    fn = lambda xx: forward_functional(xx, layer.bias,
                                       layer.get_tensor_args(), layer.meta)
    dt = timed_slope(fn, xm, n1, n2)
    wbytes = K * N // 2 + (K // gs) * N * 4 * 2 + K * 2 + N * 2
    report("fused", dt, wbytes)

    best_stream = max(v for k, v in results.items() if k != "fused")
    print(f"\nceiling (best stream): {best_stream:.1f} GB/s")
    print(f"fused/ceiling: {results['fused']/best_stream:.3f}")


if __name__ == "__main__":
    main()
