# SPDX-License-Identifier: Apache-2.0
"""Fold probe 3: honest streaming ceiling + fine block sweep (M=1 no-pad).

The probe2 streaming numbers were invalid: without a loop-carry dependency
XLA hoists the pallas_call out of the fori_loop. Here the stream kernel takes
x from the carry so every iteration re-streams W.
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gemlite_tpu.bitpack import pack_weights_over_cols
from scripts.probe_fold import (N, K, GS, P, T, MAGIC, OFFSET, W_NBITS,
                                report, timed_robust, fold_codes)
from scripts.probe_fold2 import run as run_fold_swap


def run_stream(x, Wp, bn, bk, with_meta=None):
    """sum over w blocks + x[0,0]; x dependency defeats hoisting."""
    n_k = K // bk
    n_in = 2 + (2 if with_meta is not None else 0)

    def kernel(*refs):
        x_ref = refs[0]
        w_ref = refs[1]
        o_ref = refs[n_in]
        acc_ref = refs[n_in + 1]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = jnp.sum(w_ref[...], axis=0, keepdims=True).astype(jnp.float32)
        if with_meta is not None:
            a = a + refs[2][pl.ds(0, 1), :] + refs[3][pl.ds(0, 1), :]
        acc_ref[...] += a + x_ref[0, 0]  # x is f32: 32-bit scalar extract

        @pl.when(k == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...]

    in_specs = [
        pl.BlockSpec((1, 128), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
    ]
    args = [x, Wp]
    if with_meta is not None:
        s_t, z_t = with_meta
        G = K // GS
        in_specs += [
            pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ]
        args += [s_t, z_t]
    return pl.pallas_call(
        kernel,
        grid=(N // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def main():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)
    x1 = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

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
    x128 = x1[:, :128].astype(jnp.float32)

    # ---- honest streaming ceiling --------------------------------------
    for bn, bk in [(1024, 2048), (2048, 1024), (1024, 1024), (1024, 4096),
                   (2048, 2048)]:
        f = lambda xx, bn=bn, bk=bk: run_stream(xx, Wp_f, bn, bk)
        report(f"S w-only bn={bn} bk={bk}", timed_robust(f, x128), wbytes)
    for bn, bk in [(1024, 2048), (2048, 1024)]:
        f = lambda xx, bn=bn, bk=bk: run_stream(xx, Wp_f, bn, bk,
                                                with_meta=(s_t, zf_t))
        report(f"S w+meta bn={bn} bk={bk}", timed_robust(f, x128), allbytes)

    # ---- fold kernel, M=1 no-pad, fine block sweep ----------------------
    for bn, bk in [(1024, 2048), (1024, 4096), (2048, 2048), (1024, 1024),
                   (2048, 1024), (512, 2048), (512, 4096)]:
        try:
            fE = lambda xx, bn=bn, bk=bk: run_fold_swap(
                xx.reshape(1, G, GS), Wp_f, s_t, zf_t, 1, bn, bk)
            y = fE(x1)
            rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
            report(f"E bn={bn} bk={bk} M=1 full (rel={rel:.1e})",
                   timed_robust(fE, x1), allbytes)
        except Exception as e:
            print(f"E bn={bn} bk={bk} FAILED: {str(e)[-200:]}")

    # ---- meta dtype variants at the best block --------------------------
    s_b, z_b = s_t.astype(jnp.bfloat16), zf_t.astype(jnp.bfloat16)
    bytes_b = K * N // 2 + G * N * 2 * 2 + K * 2 + N * 2
    for bn, bk in [(1024, 2048), (2048, 1024)]:
        fF = lambda xx, bn=bn, bk=bk: run_fold_swap(
            xx.reshape(1, G, GS), Wp_f, s_b, z_b, 1, bn, bk)
        y = fF(x1)
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"F bf16 meta bn={bn} bk={bk} (rel={rel:.1e})",
               timed_robust(fF, x1), bytes_b)


if __name__ == "__main__":
    main()
