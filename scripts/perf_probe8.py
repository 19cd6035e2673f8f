# Probe 8: group-batched raw dots + f32 correction (no per-element scale ops).
import sys, functools
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
from gemlite_tpu.bitpack import pack_weights_over_cols
Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)
scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)
s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
zoff_t = jnp.asarray(zeros_nk.T + 128.0, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)
W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
         scales_nk[:, :, None]).reshape(N, K)
ref = (np.asarray(x, np.float32) @ W_deq.T)
allbytes = K * N // 2 + G * N * 2 * 2 + K * 2 + N * 2


def batched_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Planes stacked (4, r, bn) -> (4c, t, bn); lhs (4c, bm, t); batched raw
    dots; f32 epilogue: acc += sum_c s * (raw_c - xsum_c * zoff)."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    planes = []
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        planes.append(pltpu.bitcast(t, jnp.bfloat16))
    rhs = jnp.stack(planes, axis=0).reshape(4 * c, t_rows, bn)
    xq = x4_ref[...]                                  # (4, bm, K4b) K4b = r
    lhs = xq.reshape(4, bm, c, t_rows).transpose(0, 2, 1, 3).reshape(4 * c, bm, t_rows)
    raw = jax.lax.dot_general(lhs, rhs, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)   # (4c, bm, bn)
    raw = raw.reshape(4, c, bm, bn).sum(axis=0)                     # (c, bm, bn)
    xs = jnp.sum(xq.astype(jnp.float32).reshape(4, bm, c, t_rows), axis=(0, 3))
    xs = xs.swapaxes(0, 1)[:, :, None]                              # (c, bm, 1)
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum((raw - xs * zrow) * srow, axis=0)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_packed(kern_fn, xx, bm, bn, bk):
    xp = jnp.pad(xx, ((0, bm - xx.shape[0]), (0, 0)))
    x4 = xp.reshape(bm, K // 4, 4).transpose(2, 0, 1)
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    out = pl.pallas_call(
        kern, grid=(N // bn, K // bk),
        in_specs=[pl.BlockSpec((4, bm, bk // 4), lambda j, k: (0, 0, k)),
                  pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
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
        print(f"{tag} FAILED: {str(e)[:110]}")
        sys.stdout.flush()


for bn, bk in [(1024, 1024), (2048, 1024), (2048, 2048), (1024, 2048), (4096, 1024),
               (2048, 512), (4096, 512)]:
    check_and_time(f"batched bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run_packed(batched_kernel, xx, 8, bn, bk))
