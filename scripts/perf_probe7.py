# Probe 7: kill the dequant broadcast cost.
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


def implicit_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Dequant via implicit (c,1,bn) broadcast — no materialized s_e/z_e."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    s3 = s_ref[pl.ds(k * c, c), :][:, None, :]     # (c,1,bn)
    z3 = z_ref[pl.ds(k * c, c), :][:, None, :]
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16).reshape(c, t_rows, bn)
        b = ((v - z3) * s3).reshape(r, bn)
        acc[...] += jax.lax.dot_general(x4_ref[j], b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def groupstep_kernel(x4_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """bk == gs: raw plane dots + post-dot correction acc += s*(raw - zoff*xsum).
    Planes dotted separately (contraction gs/4)."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]                                  # (gs/8, bn)
    raw = None
    for j in range(4):
        t = ((w >> (4 * j)) & NIBMASK) | MAGIC
        v = pltpu.bitcast(t, jnp.bfloat16)          # (gs/4, bn)
        d = jax.lax.dot_general(x4_ref[j], v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        raw = d if raw is None else raw + d
    xs = jnp.sum(x4_ref[...].astype(jnp.float32), axis=(0, 2))[:, None]  # (bm,1)
    srow = s_ref[pl.ds(k, 1), :].astype(jnp.float32)      # (1,bn)
    zrow = z_ref[pl.ds(k, 1), :].astype(jnp.float32)
    acc[...] += (raw - xs * zrow) * srow
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
        print(f"{tag} FAILED: {str(e)[:90]}")
        sys.stdout.flush()


for bn, bk in [(2048, 1024), (1024, 1024), (2048, 2048), (4096, 1024)]:
    check_and_time(f"implicit bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run_packed(implicit_kernel, xx, 8, bn, bk))
for bn in (1024, 2048, 4096):
    check_and_time(f"groupstep bn={bn} bk=128",
                   lambda xx, bn=bn: run_packed(groupstep_kernel, xx, 8, bn, GS))
