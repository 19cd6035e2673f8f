# SPDX-License-Identifier: Apache-2.0
"""Fold probe, part 2: Mosaic-compatible batch layout + streaming ceiling.

tpu.matmul needs batch dims in the SAME position: (c, bm, gs) x (c, gs, bn).
Getting x there without a host-side transpose means an in-kernel
swapaxes(0, 1) of the tiny (bm, c, gs) block.

Cases:
  S   streaming ceiling: same grid, kernel just reduces the w block
  C2  folded W, x (Mp, G, gs) 3D, in-kernel swapaxes -> batched dot
  E2  C2 with Mp = M = 1 (no pad, out (1, N))    [zero XLA-side ops]
  G   block sweep on the best variant
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gemlite_tpu.bitpack import pack_weights_over_cols
from scripts.probe_fold import (N, K, GS, P, T, MAGIC, OFFSET, W_NBITS,
                                report, timed_robust, fold_codes)


def make_kernel(bm, bn, bk, n_k):
    c = bk // GS

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[...]
        planes = [
            pltpu.bitcast(((w >> (W_NBITS * j)) & 0x000F000F) | MAGIC,
                          jnp.bfloat16).reshape(c, T, bn)
            for j in range(P)
        ]
        bg = jnp.stack(planes, axis=1).reshape(c, GS, bn)

        xg = jnp.swapaxes(x_ref[...], 0, 1)     # (bm, c, gs) -> (c, bm, gs)
        raw = jax.lax.dot_general(
            xg, bg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]

        s3 = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
        z3 = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
        acc_ref[...] += jnp.sum((raw - xs * OFFSET) * s3 + xs * z3, axis=0)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    return kernel


def run(xq, Wp, s_t, z_t, bm, bn, bk):
    n_k = K // bk
    c = bk // GS
    G = K // GS
    return pl.pallas_call(
        make_kernel(bm, bn, bk, n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, c, GS), lambda j, k: (0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K * 2 + bm * N * 2,
            transcendentals=0),
    )(xq, Wp, s_t, z_t)


def run_stream(Wp, bn, bk):
    """Streaming ceiling probe: just reduce each w block into the output."""
    n_k = K // bk

    def kernel(w_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.sum(w_ref[...].astype(jnp.float32), axis=0,
                                keepdims=True)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(N // bn, n_k),
        in_specs=[pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(Wp)


def main():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)
    x1 = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)
    x8 = jnp.pad(x1, ((0, 7), (0, 0)))

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = np.asarray(x1, np.float32) @ W_deq.T
    refm = float(np.mean(np.abs(ref)))
    allbytes = K * N // 2 + G * N * 4 * 2 + K * 2 + N * 2
    wbytes = K * N // 2

    Wq_f = fold_codes(Wq)
    Wp_f, _ = pack_weights_over_cols(jnp.asarray(Wq_f), 4, 32, transpose=True)
    s_t = jnp.asarray(scales_nk.T)
    zf_t = jnp.asarray((-zeros_nk * scales_nk).T)

    # ---- S: streaming ceiling ------------------------------------------
    for bn, bk in [(2048, 1024), (4096, 1024), (4096, 512), (2048, 512)]:
        try:
            f = lambda xx, bn=bn, bk=bk: run_stream(Wp_f + xx[0, 0].astype(jnp.int32), bn, bk)
            # note: +x[0,0] forces the loop-carried dep to touch W (prevents hoist)
            f2 = lambda xx, bn=bn, bk=bk: run_stream(Wp_f, bn, bk) + xx[0, 0]
            y = f2(x1)
            report(f"S stream-only bn={bn} bk={bk}", timed_robust(f2, x1), wbytes)
        except Exception as e:
            print(f"S bn={bn} bk={bk} FAILED: {str(e)[-800:]}")

    # ---- C2: folded + in-kernel swapaxes, padded M=8 --------------------
    x8_3d = x8.reshape(8, G, GS)
    try:
        fC = lambda xx: run(xx, Wp_f, s_t, zf_t, 8, 2048, 1024)
        y = fC(x8_3d)[:1]
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"C2 fold+swap kernel-only (rel={rel:.1e})",
               timed_robust(fC, x8_3d), allbytes)
    except Exception as e:
        print(f"C2 FAILED: {str(e)[-800:]}")
        return

    # ---- E2: M=1 no-pad -------------------------------------------------
    try:
        x1_3d = x1.reshape(1, G, GS)
        fE = lambda xx: run(xx.reshape(1, G, GS), Wp_f, s_t, zf_t, 1, 2048, 1024)
        y = fE(x1)
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"E2 M=1 nopad full path (rel={rel:.1e})",
               timed_robust(fE, x1), allbytes)
    except Exception as e:
        print(f"E2 FAILED: {str(e)[-800:]}")

    # ---- G: block sweep on C2 (padded, kernel-only) ---------------------
    for bn, bk in [(1024, 1024), (4096, 1024), (2048, 512), (4096, 512),
                   (2048, 2048), (4096, 2048), (2048, 4096), (1024, 512),
                   (512, 1024), (1024, 2048)]:
        try:
            fG = lambda xx, bn=bn, bk=bk: run(xx, Wp_f, s_t, zf_t, 8, bn, bk)
            y = fG(x8_3d)[:1]
            rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
            report(f"G bn={bn} bk={bk} (rel={rel:.1e})",
                   timed_robust(fG, x8_3d), allbytes)
        except Exception as e:
            print(f"G bn={bn} bk={bk} FAILED: {str(e)[-200:]}")


if __name__ == "__main__":
    main()
