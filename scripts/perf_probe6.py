# Probe 6: cost decomposition — dense pallas gemv vs raw-unpack-dot vs full fused.
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
Wdense = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.bfloat16)
scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)
s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
zoff_t = jnp.asarray(zeros_nk.T + 128.0, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)
wbytes = K * N // 2


def dense_kernel(x_ref, w_ref, o_ref, acc, *, bm, bn, bk):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    acc[...] += jax.lax.dot_general(x_ref[...], w_ref[...],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_dense(xx, bm, bn, bk):
    xp = jnp.pad(xx, ((0, bm - xx.shape[0]), (0, 0)))
    kern = functools.partial(dense_kernel, bm=bm, bn=bn, bk=bk)
    out = pl.pallas_call(
        kern, grid=(N // bn, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, Wdense)
    return out[:1]


def rawdot_kernel(x4_ref, w_ref, o_ref, acc, *, bm, bn, bk):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)
        acc[...] += jax.lax.dot_general(x4_ref[j], v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def dequant_nodot_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Full dequant chain, but accumulate b directly (no MXU) — isolates VPU."""
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
    tot = jnp.zeros((8, bn), jnp.float32)
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)
        b = (v - z_e) * s_e
        tot += b.reshape(r // 8, 8, bn).astype(jnp.float32).sum(axis=0)
    acc[...] += tot[:acc.shape[0]] + x4_ref[0, 0, 0]
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run_packed(kern_fn, xx, bm, bn, bk, with_meta):
    xp = jnp.pad(xx, ((0, bm - xx.shape[0]), (0, 0)))
    x4 = xp.reshape(bm, K // 4, 4).transpose(2, 0, 1)
    if with_meta:
        kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
        specs = [pl.BlockSpec((4, bm, bk // 4), lambda j, k: (0, 0, k)),
                 pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j)),
                 pl.BlockSpec((G, bn), lambda j, k: (0, j)),
                 pl.BlockSpec((G, bn), lambda j, k: (0, j))]
        args = (x4, Wp, s_t, zoff_t)
    else:
        kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk)
        specs = [pl.BlockSpec((4, bm, bk // 4), lambda j, k: (0, 0, k)),
                 pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j))]
        args = (x4, Wp)
    out = pl.pallas_call(
        kern, grid=(N // bn, K // bk),
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)
    return out[:1]


bn, bk = 2048, 1024
for tag, f, bytes_ in [
    ("dense bf16 gemv pallas (33.5MB)",
     lambda xx: run_dense(xx, 8, 512, 512), 2 * K * N),
    ("dense bf16 gemv pallas bn2048 bk1024",
     lambda xx: run_dense(xx, 8, 2048, 1024), 2 * K * N),
    ("raw unpack+dot (no dequant)",
     lambda xx: run_packed(rawdot_kernel, xx, 8, bn, bk, False), wbytes),
    ("dequant chain no dot",
     lambda xx: run_packed(dequant_nodot_kernel, xx, 8, bn, bk, True), wbytes),
    ("full fused (fold2)",
     lambda xx: run_packed(p3.f_fold2_kernel, xx, 8, bn, bk, True), wbytes),
]:
    try:
        f(x)
        dt = timed_robust(f, x)
        p3.report(tag, dt, bytes_)
    except Exception as e:
        print(f"{tag} FAILED: {str(e)[:90]}")
        sys.stdout.flush()
