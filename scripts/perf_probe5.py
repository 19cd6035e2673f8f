# Probe 5: DMA/compute overlap knobs for the fused decode kernel.
import sys, functools, time
sys.argv = ["x"]
import importlib
p3 = importlib.import_module("scripts.perf_probe3")
from scripts.perf_probe4 import timed_robust
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = K = 4096; GS = 128
NIBMASK = 0x000F000F; MAGIC = 0x43004300

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
allbytes = K * N // 2 + G * N * 2 * 2 + K * 2 + N * 2


def fold2_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    s = s_ref[pl.ds(k * c, c), :]
    zoff = z_ref[pl.ds(k * c, c), :]
    s_e = jnp.broadcast_to(s[:, None, :], (c, t_rows, bn)).reshape(r, bn)
    z_e = jnp.broadcast_to(zoff[:, None, :], (c, t_rows, bn)).reshape(r, bn)
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)
        b = (v - z_e) * s_e
        acc[...] += jax.lax.dot_general(x4_ref[j], b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run(x, bm, bn, bk, sem, swap_grid=False):
    M = x.shape[0]
    xp = jnp.pad(x, ((0, bm - M), (0, 0)))
    x4 = xp.reshape(bm, K // 4, 4).transpose(2, 0, 1)
    kern = functools.partial(fold2_kernel, bm=bm, bn=bn, bk=bk, gs=GS)
    if swap_grid:
        grid = (K // bk, N // bn)
        im_x = lambda k, j: (0, 0, k); im_w = lambda k, j: (k, j)
        im_m = lambda k, j: (0, j); im_o = lambda k, j: (0, j)
    else:
        grid = (N // bn, K // bk)
        im_x = lambda j, k: (0, 0, k); im_w = lambda j, k: (k, j)
        im_m = lambda j, k: (0, j); im_o = lambda j, k: (0, j)
    out = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((4, bm, bk // 4), im_x),
            pl.BlockSpec((bk // 8, bn), im_w),
            pl.BlockSpec((G, bn), im_m),
            pl.BlockSpec((G, bn), im_m),
        ],
        out_specs=pl.BlockSpec((bm, bn), im_o),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
    )(x4, Wp, s_t, zoff_t)
    return out[:1]


def check_and_time(tag, f):
    try:
        y = f(x)
        rel = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref))) / \
            float(np.mean(np.abs(ref)))
        dt = timed_robust(f, x)
        p3.report(f"{tag} (rel={rel:.1e})", dt, allbytes)
    except Exception as e:
        print(f"{tag} FAILED: {str(e)[:90]}")
        sys.stdout.flush()


for bn, bk in [(2048, 1024), (2048, 2048), (1024, 2048), (4096, 1024), (4096, 2048)]:
    if N % bn or K % bk:
        continue
    check_and_time(f"par/arb bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run(xx, 8, bn, bk, ("parallel", "arbitrary")))
    check_and_time(f"arb/arb bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run(xx, 8, bn, bk, ("arbitrary", "arbitrary")))
# k-outer grid: output block revisited non-contiguously; still valid since
# acc keyed to (j) blocks... actually acc is shared scratch — only valid if
# j is innermost per k? NO — k outer means for fixed k we sweep j; acc per j
# accumulates across k steps that are far apart -> WRONG results expected;
# skip swap_grid correctness, only measure stream shape effect.
