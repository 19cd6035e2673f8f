# SPDX-License-Identifier: Apache-2.0
"""Probe 2: isolate the VPU unpack cost (no matmul) + container dtype effects.

All kernels stream the full packed weight matrix (8.4 MB for W4 4096x4096)
and reduce it to a tiny output, consuming x so nothing is hoisted.
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = K = 4096
GS = 128


def timed(fn, x, n1=50, n2=150, repeats=3):
    from jax import lax

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


def report(name, dt, bytes_):
    print(f"{name:52s} {dt*1e6:8.1f} us  {bytes_/dt/1e9:7.1f} GB/s")
    sys.stdout.flush()


def make_runner(kern, W, bn, bk_words, n_k, extra_specs=(), extra_args=()):
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((1, 128), lambda j, k: (0, 0)),
                pl.BlockSpec((bk_words, bn), lambda j, k: (k, j)),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec((8, 128), lambda j, k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(x.astype(jnp.float32), W, *extra_args)
    return run


# --- kernels: each consumes x scalar, streams w block, applies a chain -----

def k_stream(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    s = jnp.sum(w_ref[...].astype(jnp.float32)) + x_ref[0, 0]
    acc[...] += jnp.full_like(acc, s)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


def k_unpack_planes_i32(x_ref, w_ref, o_ref, acc):
    """int32 container, plane-batched unpack (8, r, bn) -> bf16, sum."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0) * 4
    b = ((w[None] >> shifts) & 15).astype(jnp.bfloat16)
    s = jnp.sum(b.astype(jnp.float32)) + x_ref[0, 0]
    acc[...] += jnp.full_like(acc, s)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


def k_unpack_interleave_i32(x_ref, w_ref, o_ref, acc, *, bk, bn):
    """int32 container, interleave reshape to (bk, bn) bf16, sum."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) * 4
    b = ((w[:, None, :] >> shifts) & 15).reshape(bk, bn).astype(jnp.bfloat16)
    s = jnp.sum(b.astype(jnp.float32)) + x_ref[0, 0]
    acc[...] += jnp.full_like(acc, s)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


def k_unpack_planes_i8(x_ref, w_ref, o_ref, acc):
    """int8 container (2 elems/word), plane-batched int8 unpack, sum."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]  # int8 (bk/2, bn)
    lo = (w & 15).astype(jnp.bfloat16)
    hi = ((w >> 4) & 15).astype(jnp.bfloat16)
    s = (jnp.sum(lo.astype(jnp.float32)) + jnp.sum(hi.astype(jnp.float32))
         + x_ref[0, 0])
    acc[...] += jnp.full_like(acc, s)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


def k_unpack_interleave_i8(x_ref, w_ref, o_ref, acc, *, bk, bn):
    """int8 container, interleave reshape (factor 2), sum."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 1), 1) * 4
    b = ((w[:, None, :].astype(jnp.int32) >> shifts) & 15).reshape(bk, bn).astype(jnp.bfloat16)
    s = jnp.sum(b.astype(jnp.float32)) + x_ref[0, 0]
    acc[...] += jnp.full_like(acc, s)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


# --- full fused variants (with dot) ---------------------------------------

def k_fused_i8_fold(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """int8 container; dequant lo/hi planes separately (fold scales via
    sublane broadcast over half-group rows); two dots with contraction bk/2."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]                    # (bk/2, bn) int8
    c = bk // gs
    h = gs // 2                       # container rows per group
    r = bk // 2
    s = s_ref[pl.ds(k * c, c), :]     # (c, bn) bf16
    z = z_ref[pl.ds(k * c, c), :]
    s_e = jnp.broadcast_to(s[:, None, :], (c, h, bn)).reshape(r, bn)
    z_e = jnp.broadcast_to(z[:, None, :], (c, h, bn)).reshape(r, bn)
    lo = (w & 15).astype(jnp.bfloat16) * s_e + z_e
    hi = ((w >> 4) & 15).astype(jnp.bfloat16) * s_e + z_e

    x = x_ref[...]                    # (bm, bk): k = 2*rr + plane
    xl = x[:, 0::2]                   # even k -> lo plane   (bm, r)
    xh = x[:, 1::2]
    acc[...] += jax.lax.dot_general(xl, lo, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    acc[...] += jax.lax.dot_general(xh, hi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def k_fused_i8_raw(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """int8 container; raw-code dots per plane per group-batch + epilogue
    correction acc += s*(raw) + z*xsum. Contraction gs/2 per group, batched c."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    h = gs // 2
    r = bk // 2
    lo = (w & 15).astype(jnp.bfloat16).reshape(c, h, bn)
    hi = ((w >> 4) & 15).astype(jnp.bfloat16).reshape(c, h, bn)

    x = x_ref[...]
    xl = x[:, 0::2].reshape(bm, c, h).swapaxes(0, 1)   # (c, bm, h)
    xh = x[:, 1::2].reshape(bm, c, h).swapaxes(0, 1)
    raw = jax.lax.dot_general(xl, lo, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    raw += jax.lax.dot_general(xh, hi, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    xs = jnp.sum(x.astype(jnp.float32).reshape(bm, c, gs), axis=2).swapaxes(0, 1)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum(raw * srow + xs * zrow, axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def k_fused_i32_fold(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """int32 container; interleave unpack; fold scales via sublane broadcast;
    ONE dot with contraction bk."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) * 4
    b = ((w[:, None, :] >> shifts) & 15).reshape(bk, bn).astype(jnp.bfloat16)
    s = s_ref[pl.ds(k * c, c), :]
    z = z_ref[pl.ds(k * c, c), :]
    s_e = jnp.broadcast_to(s[:, None, :], (c, gs, bn)).reshape(bk, bn)
    z_e = jnp.broadcast_to(z[:, None, :], (c, gs, bn)).reshape(bk, bn)
    bq = b * s_e + z_e
    acc[...] += jax.lax.dot_general(x_ref[...], bq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_fused(kern_fn, x, W, s, z, bm, bn, bk, elems):
    G = K // GS
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    out = pl.pallas_call(
        kern,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk // elems, bn), lambda j, k: (k, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xp, W, s, z)
    return out[:1]


def main():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = np.full((N, G), 2.0**-10, np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)

    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.bitpack import pack_weights_over_cols

    layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(
        Wq, scales_nk, zeros_nk)
    W32 = layer.W_q                                   # (K/8, N) int32
    W8, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 8, transpose=True)  # (K/2, N) int8
    s_t = layer.scales.astype(jnp.bfloat16)
    z_t = layer.zeros.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = (np.asarray(x, np.float32) @ W_deq.T)
    wbytes = K * N // 2
    allbytes = wbytes + G * N * 2 * 2 + K * 2 + N * 2

    # --- unpack-only chains -------------------------------------------------
    for name, kern, W, elems in [
        ("stream i32", k_stream, W32, 8),
        ("stream i8", k_stream, W8, 2),
        ("unpack planes i32", k_unpack_planes_i32, W32, 8),
        ("unpack interleave i32",
         functools.partial(k_unpack_interleave_i32, bk=1024, bn=512), W32, 8),
        ("unpack planes i8", k_unpack_planes_i8, W8, 2),
        ("unpack interleave i8",
         functools.partial(k_unpack_interleave_i8, bk=1024, bn=512), W8, 2),
    ]:
        bn, bk = 512, 1024
        try:
            f = make_runner(kern, W, bn, bk // elems, K // bk)
            f(x)
            dt = timed(f, x)
            report(f"{name} bn={bn} bk={bk}", dt, wbytes)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:90]}")
            sys.stdout.flush()

    # --- fused variants -----------------------------------------------------
    for name, kern, W, elems in [
        ("fused i8 fold", k_fused_i8_fold, W8, 2),
        ("fused i8 raw", k_fused_i8_raw, W8, 2),
        ("fused i32 fold", k_fused_i32_fold, W32, 8),
    ]:
        for bm in (8,):
            for bn, bk in [(512, 1024), (1024, 1024), (2048, 1024), (2048, 2048)]:
                try:
                    f = lambda xx, kern=kern, W=W, bm=bm, bn=bn, bk=bk, e=elems: \
                        run_fused(kern, xx, W, s_t, z_t, bm, bn, bk, e)
                    y = f(x)
                    err = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref)))
                    dt = timed(f, x)
                    report(f"{name} bm={bm} bn={bn} bk={bk} (err={err:.2e})",
                           dt, allbytes)
                except Exception as e:
                    print(f"{name} bm={bm} bn={bn} bk={bk} FAILED: {str(e)[:90]}")
                    sys.stdout.flush()


if __name__ == "__main__":
    main()
