# SPDX-License-Identifier: Apache-2.0
"""Decode last-mile probe: pack-time plane-fold of the x permutation.

Idea: the decode kernel's plane stacking imposes a within-group contraction
order u = j*t + r that currently requires an XLA-side permutation (+transpose
to (G, Mp, gs)) of x on EVERY call.  If instead the weight CODES are permuted
at pack time (codes.reshape(N, G, P, t).swapaxes(2, 3)), the kernel's natural
stacking order becomes ascending-k, so x ships as a plain (Mp, G, gs) reshape
(no data movement) or even raw 2D (Mp, K) with an in-kernel lane-split reshape
(legal when gs % 128 == 0).

Cases (A16W4 gs=128 4096x4096 M=1, mode 4 fma, f32 meta unless noted):
  A  current full path (forward_functional)           [baseline]
  B  current kernel only (x pre-transformed outside the timed loop)
  C  folded W, x (Mp, G, gs) 3D natural order, batch-middle dot
  D  folded W, x (Mp, K) 2D, in-kernel reshape (gs=128 lane-aligned)
  E  D + host-side pad(1->8) + out slice inside the timed fn  [full-path cost]
  F  E with bf16 meta strips
  G  block sweep over (bn, bk) for variant E
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

N = K = 4096
GS = 128
W_NBITS = 4
P = 16 // W_NBITS          # 4 bf16 planes
T = GS // P                # 32 rows per plane per group
MAGIC = 0x43004300
OFFSET = 128.0


def report(name, dt, nbytes):
    print(f"{name:44s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:7.1f} GB/s")
    sys.stdout.flush()


def timed_robust(fn, x, n1=300, n2=1200, repeats=3):
    @jax.jit
    def loop(x, n):
        def body(i, c):
            xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
            y = fn(xx)
            return y.astype(jnp.float32).ravel()[0] * 1e-12
        return lax.fori_loop(0, n, body, jnp.float32(0))
    float(loop(x, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def fold_codes(codes, gs=GS):
    n, k = codes.shape
    g = k // gs
    return codes.reshape(n, g, P, gs // P).swapaxes(2, 3).reshape(n, k)


def make_fold_kernel(bm, bn, bk, n_k, x2d, meta_f32=True):
    """Folded-weight decode kernel. x2d: x block is (bm, bk) reshaped in-kernel;
    else x is (bm, c, gs) 3D block."""
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

        if x2d:
            xg = x_ref[...].reshape(bm, c, GS)
        else:
            xg = x_ref[...]                       # (bm, c, gs)
        # batch dim in the middle of lhs: out = (c, bm, bn)
        raw = jax.lax.dot_general(
            xg, bg, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=2).T[:, :, None]  # (c, bm, 1)

        s3 = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
        z3 = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
        contrib = (raw - xs * OFFSET) * s3 + xs * z3
        acc_ref[...] += jnp.sum(contrib, axis=0)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    return kernel


def run_fold(xq, Wp, s_t, z_t, bm, bn, bk, x2d):
    n_k = K // bk
    c = bk // GS
    G = K // GS
    if x2d:
        x_spec = pl.BlockSpec((bm, bk), lambda j, k: (0, k),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((bm, c, GS), lambda j, k: (0, k, 0),
                              memory_space=pltpu.VMEM)
    kern = make_fold_kernel(bm, bn, bk, n_k, x2d)
    return pl.pallas_call(
        kern,
        grid=(N // bn, n_k),
        in_specs=[
            x_spec,
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
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // 2 + bm * K * 2 + bm * N * 2,
            transcendentals=0,
        ),
    )(xq, Wp, s_t, z_t)


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
    # bench.py byte accounting (f32 meta)
    allbytes = K * N // 2 + G * N * 4 * 2 + K * 2 + N * 2

    # ---- A: current full path -------------------------------------------
    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional
    layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(
        Wq, scales_nk.reshape(-1, 1), zeros_nk.reshape(-1, 1))
    fA = lambda xx: forward_functional(xx, None, layer.get_tensor_args(), layer.meta)
    y = fA(x1)
    rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
    report(f"A current full path (rel={rel:.1e})", timed_robust(fA, x1), allbytes)

    # ---- B: current kernel only (x pre-transformed) ---------------------
    from gemlite_tpu.ops.pallas_decode import (
        pallas_decode_matmul, permute_x_for_planes, select_decode_config)
    cfg = select_decode_config(layer.meta, 1, N, K)
    print(f"   (B/C/D use bm=8 bn={cfg.block_n} bk={cfg.block_k})")
    bm, bn, bk = 8, cfg.block_n, cfg.block_k

    # kernel-only via pallas_decode_matmul on a pre-padded x (M=8): the
    # permute/pad/transpose still run per call inside, so instead time the
    # raw pallas_call path by pre-building xq outside fn.
    # Build pre-transformed input (G_eff, Mp, gs):
    x8 = jnp.pad(x1, ((0, 7), (0, 0)))
    fB_pre = permute_x_for_planes(x8, W_NBITS, GS).reshape(8, G, GS).transpose(1, 0, 2)

    s_t = jnp.asarray(scales_nk.T)                     # (G, N) f32
    zf_t = jnp.asarray((-(zeros_nk + OFFSET) * scales_nk +
                        OFFSET * scales_nk).T)         # plain -z*s fold (G, N)
    # NOTE: kernel computes (raw - xs*OFFSET)*s + xs*z' with z' = -z*s
    zfold_t = jnp.asarray((-zeros_nk * scales_nk).T)   # (G, N) f32

    from gemlite_tpu.ops import pallas_decode as pd
    kernB = pd._make_kernel(
        W_nbits=4, W_group_mode=4, channel_scale_mode=0, zero_is_scalar=False,
        has_scales=True, has_zeros=True, has_scales_x=False, fma_zeros=True,
        out_jdtype=jnp.bfloat16, bm=bm, bn=bn, bk=bk, gs=GS, real_gs=GS,
        n_k=K // bk)
    c = bk // GS

    def fB(xq3):
        return pl.pallas_call(
            kernB,
            grid=(N // bn, K // bk),
            in_specs=[
                pl.BlockSpec((c, bm, GS), lambda j, k: (k, 0, 0),
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
        )(xq3, layer.W_q, s_t, zfold_t)

    y = fB(fB_pre)[:1]
    rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
    report(f"B current kernel only (rel={rel:.1e})", timed_robust(fB, fB_pre), allbytes)

    # ---- C/D: folded weights --------------------------------------------
    Wq_folded = fold_codes(Wq)
    Wp_f, _ = pack_weights_over_cols(jnp.asarray(Wq_folded), 4, 32, transpose=True)

    x8_3d = x8.reshape(8, G, GS)
    try:
        fC = lambda xx: run_fold(xx, Wp_f, s_t, zfold_t, bm, bn, bk, x2d=False)
        y = fC(x8_3d)[:1]
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"C folded W, 3D x kernel-only (rel={rel:.1e})",
               timed_robust(fC, x8_3d), allbytes)
    except Exception as e:
        print(f"C FAILED: {str(e)[:300]}")

    try:
        fD = lambda xx: run_fold(xx, Wp_f, s_t, zfold_t, bm, bn, bk, x2d=True)
        y = fD(x8)[:1]
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"D folded W, 2D x kernel-only (rel={rel:.1e})",
               timed_robust(fD, x8), allbytes)

        # ---- E: D + pad + slice in the timed fn -------------------------
        def fE(xx):
            xp = jnp.pad(xx, ((0, 7), (0, 0)))
            return run_fold(xp, Wp_f, s_t, zfold_t, bm, bn, bk, x2d=True)[:1]
        y = fE(x1)
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        report(f"E D+pad+slice full path (rel={rel:.1e})",
               timed_robust(fE, x1), allbytes)

        # ---- F: E with bf16 meta ----------------------------------------
        s_b = s_t.astype(jnp.bfloat16)
        z_b = zfold_t.astype(jnp.bfloat16)
        def fF(xx):
            xp = jnp.pad(xx, ((0, 7), (0, 0)))
            return run_fold(xp, Wp_f, s_b, z_b, bm, bn, bk, x2d=True)[:1]
        y = fF(x1)
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
        bytes_b = K * N // 2 + G * N * 2 * 2 + K * 2 + N * 2
        report(f"F E w/ bf16 meta (rel={rel:.1e})", timed_robust(fF, x1), bytes_b)

        # ---- G: block sweep on E ----------------------------------------
        for bnn, bkk in [(1024, 1024), (2048, 2048), (4096, 1024),
                         (2048, 512), (4096, 512), (2048, 4096), (4096, 2048)]:
            if N % bnn or K % bkk:
                continue
            try:
                def fG(xx, bnn=bnn, bkk=bkk):
                    xp = jnp.pad(xx, ((0, 7), (0, 0)))
                    return run_fold(xp, Wp_f, s_t, zfold_t, bm, bnn, bkk,
                                    x2d=True)[:1]
                y = fG(x1)
                rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - ref))) / refm
                report(f"G bn={bnn} bk={bkk} (rel={rel:.1e})",
                       timed_robust(fG, x1), allbytes)
            except Exception as e:
                print(f"G bn={bnn} bk={bkk} FAILED: {str(e)[:200]}")
    except Exception as e:
        print(f"D FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
