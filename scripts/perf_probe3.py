# SPDX-License-Identifier: Apache-2.0
"""Probe 3b: bf16 bit-trick unpack via pltpu.bitcast, standard int32 packing.

Unpack plane j in {0..3}: t = ((w >> 4j) & 0x000F000F) | 0x43004300;
pltpu.bitcast(t, bf16) -> (2r, bn) rows = codes+128 at k = 4m + j.
x pre-arranged outside the kernel as (4, M, K/4), plane j = x[:, j::4].

Variants:
  f_fold : scales folded per group (fma), 4 plane dots, contraction bk/4
  f_raw  : raw plane dots batched per group + s*raw + z'*xsum epilogue
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
NIBMASK = 0x000F000F
MAGIC = 0x43004300


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


def f_fold_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]                       # (bk/8, bn) int32
    c = bk // gs
    r = bk // 4                          # bf16 plane rows in this block
    t_rows = gs // 4                     # plane rows per group
    s = s_ref[pl.ds(k * c, c), :]        # (c, bn) bf16
    z = z_ref[pl.ds(k * c, c), :]        # z' = -(z+128)*s
    s_e = jnp.broadcast_to(s[:, None, :], (c, t_rows, bn)).reshape(r, bn)
    z_e = jnp.broadcast_to(z[:, None, :], (c, t_rows, bn)).reshape(r, bn)

    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)          # (r, bn), k = 4m+j
        b = v * s_e + z_e
        acc[...] += jax.lax.dot_general(
            x4_ref[j], b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def f_raw_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    t_rows = gs // 4

    raw = None
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16).reshape(c, t_rows, bn)
        xj = x4_ref[j].reshape(bm, c, t_rows).swapaxes(0, 1)
        d = jax.lax.dot_general(xj, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        raw = d if raw is None else raw + d

    x_all = x4_ref[...]                                   # (4, bm, bk/4)
    xs = jnp.sum(x_all.astype(jnp.float32).reshape(4, bm, c, t_rows), axis=(0, 3))
    xs = xs.swapaxes(0, 1)[:, :, None]                    # (c, bm, 1)
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum(raw * srow + xs * zrow, axis=0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_fused(kern_fn, x, Wp, s, z, bm, bn, bk):
    G = K // GS
    M = x.shape[0]
    xp = jnp.pad(x, ((0, bm - M), (0, 0)))
    x4 = xp.reshape(bm, K // 4, 4).transpose(2, 0, 1)   # plane j = x[:, j::4]
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    out = pl.pallas_call(
        kern,
        grid=(N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((4, bm, bk // 4), lambda j, k: (0, 0, k)),
            pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
            pl.BlockSpec((G, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x4, Wp, s, z)
    return out[:1]


def main():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)

    from gemlite_tpu.bitpack import pack_weights_over_cols
    Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)

    s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
    z_t = jnp.asarray((-(zeros_nk + 128.0) * scales_nk).T, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = (np.asarray(x, np.float32) @ W_deq.T)
    wbytes = K * N // 2
    allbytes = wbytes + G * N * 2 * 2 + K * 2 + N * 2

    for name, kern in [("f_fold", f_fold_kernel), ("f_raw", f_raw_kernel)]:
        for bm in (8,):
            for bn, bk in [(512, 512), (512, 1024), (1024, 1024), (2048, 1024),
                           (1024, 512), (2048, 512), (4096, 512), (1024, 2048),
                           (2048, 2048), (512, 4096), (4096, 1024)]:
                if N % bn or K % bk:
                    continue
                try:
                    f = lambda xx, kern=kern, bm=bm, bn=bn, bk=bk: \
                        run_fused(kern, xx, Wp, s_t, z_t, bm, bn, bk)
                    y = f(x)
                    err = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref)))
                    rel = err / float(np.mean(np.abs(ref)))
                    dt = timed(f, x)
                    report(f"{name} bm={bm} bn={bn} bk={bk} (rel={rel:.1e})",
                           dt, allbytes)
                except Exception as e:
                    print(f"{name} bm={bm} bn={bn} bk={bk} FAILED: {str(e)[:90]}")
                    sys.stdout.flush()


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# f_fold2: subtract-first numerics (b = (v - zoff)*s, zoff = z+128 exact bf16)
# ---------------------------------------------------------------------------
def f_fold2_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    s = s_ref[pl.ds(k * c, c), :]
    zoff = z_ref[pl.ds(k * c, c), :]        # z + 128, exact in bf16
    s_e = jnp.broadcast_to(s[:, None, :], (c, t_rows, bn)).reshape(r, bn)
    z_e = jnp.broadcast_to(zoff[:, None, :], (c, t_rows, bn)).reshape(r, bn)

    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)
        b = (v - z_e) * s_e
        acc[...] += jax.lax.dot_general(
            x4_ref[j], b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def main2():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)

    from gemlite_tpu.bitpack import pack_weights_over_cols
    Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)

    s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
    zoff_t = jnp.asarray(zeros_nk.T + 128.0, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = (np.asarray(x, np.float32) @ W_deq.T)
    wbytes = K * N // 2
    allbytes = wbytes + G * N * 2 * 2 + K * 2 + N * 2

    for bm in (8,):
        for bn, bk in [(512, 1024), (1024, 1024), (2048, 1024), (4096, 1024),
                       (1024, 2048), (2048, 2048), (512, 2048), (4096, 2048)]:
            if N % bn or K % bk:
                continue
            try:
                f = lambda xx, bm=bm, bn=bn, bk=bk: \
                    run_fused(f_fold2_kernel, xx, Wp, s_t, zoff_t, bm, bn, bk)
                y = f(x)
                err = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref)))
                rel = err / float(np.mean(np.abs(ref)))
                dt = timed(f, x, n1=100, n2=400, repeats=5)
                report(f"f_fold2 bm={bm} bn={bn} bk={bk} (rel={rel:.1e})",
                       dt, allbytes)
            except Exception as e:
                print(f"f_fold2 bm={bm} bn={bn} bk={bk} FAILED: {str(e)[:90]}")
                sys.stdout.flush()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()
