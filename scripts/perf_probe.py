# SPDX-License-Identifier: Apache-2.0
"""Decode-kernel perf probe (M=1, A16W4 gs=128, 4096x4096) on the real chip.

Variants:
  SOL   : stream weights + consume x (not hoistable) — bandwidth ceiling
  v2    : interleave-reshape unpack + group-batched raw dot
  v3    : plane-batched unpack (no sublane shuffle) + (plane,group)-batched dot
  v4    : plane-batched unpack + scale-folded planes + contraction bk/8 dot
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
W_NBITS = 4
ELEMS = 8


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
    print(f"{name:44s} {dt*1e6:8.1f} us  {bytes_/dt/1e9:7.1f} GB/s")
    sys.stdout.flush()


# -------------------------------------------------------------------------
def sol_kernel(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    acc[...] += (jnp.sum(w_ref[...]) + x_ref[0, 0].astype(jnp.float32)
                 )[None, None] * jnp.ones_like(acc)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]


def run_sol(x, W_packed, bn, bk):
    return pl.pallas_call(
        sol_kernel,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((1, 128), lambda j, k: (0, 0)),
            pl.BlockSpec((bk // ELEMS, bn), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j, k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x.astype(jnp.float32), W_packed)


# -------------------------------------------------------------------------
def v2_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, ELEMS, 1), 1) * W_NBITS
    b = ((w[:, None, :] >> shifts) & 15).reshape(bk, bn).astype(jnp.bfloat16)
    x = x_ref[...]
    xg = x.reshape(bm, c, gs).swapaxes(0, 1)
    bg = b.reshape(c, gs, bn)
    raw = jax.lax.dot_general(xg, bg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum(raw * srow + xs * zrow, axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


# -------------------------------------------------------------------------
def v3_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Plane-batched: planes (8, bk/8, bn) via leading-axis broadcast (no
    sublane shuffle); dot batched over (plane, group) with contraction gs/8."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]                       # (bk/8, bn) int32
    c = bk // gs
    r = bk // ELEMS                      # word rows
    t = gs // ELEMS                      # word rows per group
    shifts = jax.lax.broadcasted_iota(jnp.int32, (ELEMS, 1, 1), 0) * W_NBITS
    planes = ((w[None] >> shifts) & 15).astype(jnp.bfloat16)   # (8, r, bn)
    pg = planes.reshape(ELEMS, c, t, bn)                       # (8, c, t, bn)

    x = x_ref[...]                                              # (bm, bk)
    # k = g*gs + tt*8 + j  ->  (bm, c, t, 8) -> (8, c, bm, t)
    xq = x.reshape(bm, c, t, ELEMS).transpose(3, 1, 0, 2)
    raw = jax.lax.dot_general(
        xq, pg, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                     # (8, c, bm, bn)
    raw = raw.sum(axis=0)                                       # (c, bm, bn)
    xs = jnp.sum(x.astype(jnp.float32).reshape(bm, c, gs), axis=2).swapaxes(0, 1)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum(raw * srow + xs * zrow, axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


# -------------------------------------------------------------------------
def v4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Plane-batched, scales folded into planes (sublane broadcast of s),
    single plane-batched dot with contraction bk/8."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    r = bk // ELEMS
    t = gs // ELEMS
    shifts = jax.lax.broadcasted_iota(jnp.int32, (ELEMS, 1, 1), 0) * W_NBITS
    planes = ((w[None] >> shifts) & 15).astype(jnp.bfloat16)    # (8, r, bn)
    s = s_ref[pl.ds(k * c, c), :]                                # (c, bn) bf16
    z = z_ref[pl.ds(k * c, c), :]
    s_e = jnp.broadcast_to(s[:, None, :], (c, t, bn)).reshape(r, bn)
    z_e = jnp.broadcast_to(z[:, None, :], (c, t, bn)).reshape(r, bn)
    bq = planes * s_e[None] + z_e[None]                          # (8, r, bn) bf16

    x = x_ref[...]
    xq = x.reshape(bm, r, ELEMS).transpose(2, 0, 1)              # (8, bm, r)
    raw = jax.lax.dot_general(
        xq, bq, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                      # (8, bm, bn)
    acc[...] += raw.sum(axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_variant(kern_fn, x, W_packed, s, z, bm, bn, bk, zdeq=False):
    G = K // GS
    xp = jnp.pad(x, ((0, bm - x.shape[0]), (0, 0)))
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    out = pl.pallas_call(
        kern,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda j, k: (0, k)),
            pl.BlockSpec((bk // ELEMS, bn), lambda j, k: (k, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, W_packed, s, z)
    return out[:1]


def main():
    print("device:", jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = np.full((N, G), 2.0**-10, np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)

    from gemlite_tpu import GemLiteLinear, DType

    layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(
        Wq, scales_nk, zeros_nk)
    W_packed = layer.W_q
    s_t = layer.scales.astype(jnp.bfloat16)
    z_t = layer.zeros.astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = (np.asarray(x, np.float32) @ W_deq.T)

    wbytes = K * N // 2
    allbytes = wbytes + G * N * 2 * 2 + K * 2 + N * 2

    for bn, bk in [(512, 1024), (1024, 1024), (2048, 1024), (512, 4096)]:
        dt = timed(lambda xx, bn=bn, bk=bk: run_sol(xx, W_packed, bn, bk), x)
        report(f"SOL bn={bn} bk={bk}", dt, wbytes)

    for name, kern in [("v2", v2_kernel), ("v3", v3_kernel), ("v4", v4_kernel)]:
        for bm in (8,):
            for bn, bk in [(512, 1024), (1024, 1024), (256, 2048), (512, 2048),
                           (2048, 1024), (1024, 2048)]:
                if N % bn or K % bk or bk < GS or (bk // GS) % 8:
                    continue
                try:
                    f = lambda xx, bm=bm, bn=bn, bk=bk, kern=kern: run_variant(
                        kern, xx, W_packed, s_t, z_t, bm, bn, bk)
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
