# SPDX-License-Identifier: Apache-2.0
"""Probe: can native-dtype weight refs beat the packed-plane W8 paths?

The shipped 8-bit decode paths unpack int32 words into byte planes via bit
tricks (12+ VPU ops/value for fp8 with the subnormal cascade). TPUs have a
hardware convert for int8->bf16 and fp8->bf16 — if Mosaic lowers a plain
(K, N) int8 / float8_e4m3fn VMEM block + ``astype(bf16)`` + dot, the unpack
collapses to ~1 op/value and the x-permutation disappears entirely.

Variants (all 4096x4096, M=1, channel-wise scales, same byte volume 16.8 MB):
  lib_int8     - shipped library path (packed int32, byte planes)
  lib_fp8      - shipped library path for fp8-coded weights (mode 0)
  int8_native  - W as (K, N) int8, w.astype(bf16), single 2D dot
  fp8_native   - W as (K, N) float8_e4m3fn, w.astype(bf16), single 2D dot
  int8_stream  - same int8 blocks, reduce-only (streaming ceiling)

Usage: python scripts/probe_native8.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import timed_slopes

    quick = "--quick" in sys.argv
    n1, n2 = (100, 400) if quick else (200, 800)

    N = K = 4096
    rng = np.random.default_rng(0)
    codes = rng.integers(-128, 128, size=(K, N)).astype(np.int8)
    W8 = jnp.asarray(codes, jnp.int8)
    Wf8 = jnp.asarray(codes.view(np.uint8), jnp.uint8).view(jnp.float8_e4m3fn)
    x = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((1, N)) * 0.01 + 1, jnp.float32)

    def make_native(wdt, bn, bk, stream=False):
        W = W8 if wdt == "int8" else Wf8
        n_k = K // bk

        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            w = w_ref[...]
            if stream:
                acc_ref[...] += jnp.sum(
                    w.astype(jnp.float32))[None, None]
            else:
                bg = w.astype(jnp.bfloat16)
                acc_ref[...] += jax.lax.dot_general(
                    x_ref[...], bg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(k == n_k - 1)
            def _():
                acc = acc_ref[...]
                if not stream:
                    acc = acc * s_ref[...].astype(jnp.float32)
                o_ref[...] = acc.astype(jnp.bfloat16)

        oshape = jax.ShapeDtypeStruct((1, 1 if stream else N), jnp.bfloat16)
        f = pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((1, bk), lambda j, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1 if stream else bn),
                (lambda j, k: (0, 0)) if stream else (lambda j, k: (0, j)),
                memory_space=pltpu.VMEM),
            out_shape=oshape,
            scratch_shapes=[pltpu.VMEM((1, 1 if stream else bn),
                                       jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

        def run(xx):
            return f(xx, W, s)

        return run

    fns = {}
    for name, wdt, bn, bk in (
        ("i8nat_1024x4096", "int8", 1024, 4096),
        ("i8nat_2048x1024", "int8", 2048, 1024),
        ("i8nat_2048x2048", "int8", 2048, 2048),
        ("i8nat_4096x1024", "int8", 4096, 1024),
        ("f8nat_1024x4096", "fp8", 1024, 4096),
        ("f8nat_2048x1024", "fp8", 2048, 1024),
        ("f8nat_2048x2048", "fp8", 2048, 2048),
    ):
        try:
            r = make_native(wdt, bn, bk)
            jax.block_until_ready(r(x))
            fns[name] = (r, x)
        except Exception as e:  # noqa: BLE001 - probe: report and move on
            print(f"{name:<18s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    try:
        r = make_native("int8", 2048, 2048, stream=True)
        jax.block_until_ready(r(x))
        fns["i8_stream"] = (r, x)
    except Exception as e:  # noqa: BLE001
        print(f"i8_stream FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # library paths for comparison
    try:
        from gemlite_tpu import GemLiteLinear, DType
        lin = GemLiteLinear(W_nbits=8, group_size=K, in_features=K,
                            out_features=N, input_dtype=DType.BF16,
                            output_dtype=DType.BF16)
        Wu8 = jnp.asarray(codes.astype(np.int16) + 128, jnp.uint8)
        lin.pack(Wu8.T, scales=s.reshape(-1, 1).T if s.ndim == 2 else s,
                 zeros=jnp.full((1, N), 128.0, jnp.float32), bias=None)
        fwd = jax.jit(lin.forward)
        jax.block_until_ready(fwd(x))
        fns["lib_int8"] = (fwd, x)
    except Exception as e:  # noqa: BLE001
        print(f"lib_int8 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    dts = timed_slopes(fns, n1, n2)
    nbytes = K * N + N * 4 + K * 2
    for v, dt in dts.items():
        print(f"{v:<18s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
