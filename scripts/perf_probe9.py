# Probe 9: plan C (plane-major rhs rearrange) and plan D (stack+interleave).
import sys, functools
MICRO = len(sys.argv) > 1 and sys.argv[1] == "micro"
if MICRO: sys.argv = ["x", "micro"]
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


def planD_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Stack bitcast planes -> interleave reshape to natural (bk, bn) raw
    codes; c-batched raw dot (contraction gs); f32 epilogue correction."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    planes = [pltpu.bitcast(((w >> (4 * j)) & NIBMASK) | MAGIC, jnp.bfloat16)
              for j in range(4)]
    b = jnp.stack(planes, axis=1).reshape(bk, bn)        # natural k rows
    x_blk = x_ref[...]
    xg = x_blk.reshape(bm, c, gs).swapaxes(0, 1)         # (c, bm, gs)
    bg = b.reshape(c, gs, bn)
    raw = jax.lax.dot_general(xg, bg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum((raw - xs * zrow) * srow, axis=0)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def planC_kernel(xpm_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Rhs rearranged plane-major per group (c, 4*t, bn); lhs is x permuted
    outside the kernel to matching plane-major-within-group order."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    planes = [pltpu.bitcast(((w >> (4 * j)) & NIBMASK) | MAGIC, jnp.bfloat16)
              for j in range(4)]
    p4 = jnp.stack(planes, axis=0).reshape(4, c, t_rows, bn)
    bg = p4.swapaxes(0, 1).reshape(c, gs, bn)            # (c, 4*t, bn)
    x_blk = xpm_ref[...]
    xg = x_blk.reshape(bm, c, gs).swapaxes(0, 1)
    raw = jax.lax.dot_general(xg, bg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum((raw - xs * zrow) * srow, axis=0)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run(kern_fn, xx, bm, bn, bk, planeC=False):
    xp = jnp.pad(xx, ((0, bm - xx.shape[0]), (0, 0)))
    if planeC:
        # plane-major within each group: x[m, g*gs + j*t + tt] <- x[m, g*gs+4tt+j]
        t_rows = GS // 4
        xin = xp.reshape(bm, G, t_rows, 4).swapaxes(2, 3).reshape(bm, K)
    else:
        xin = xp
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    out = pl.pallas_call(
        kern, grid=(N // bn, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xin, Wp, s_t, zoff_t)
    return out[:1]


def check_and_time(tag, f):
    try:
        y = f(x)
        rel = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref))) / \
            float(np.mean(np.abs(ref)))
        dt = timed_robust(f, x)
        p3.report(f"{tag} (rel={rel:.1e})", dt, allbytes)
    except Exception as e:
        msg = str(e)
        i = msg.find("Mosaic failed")
        print(f"{tag} FAILED: {msg[i:i+160] if i>=0 else msg[:120]}")
        sys.stdout.flush()


for bn, bk in ([] if __import__("os").environ.get("MICRO") else [(1024, 1024), (2048, 1024), (2048, 2048), (1024, 2048), (4096, 1024)]):
    check_and_time(f"planD bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run(planD_kernel, xx, 8, bn, bk))
for bn, bk in ([] if __import__("os").environ.get("MICRO") else [(1024, 1024), (2048, 1024), (2048, 2048), (4096, 1024)]):
    check_and_time(f"planC bn={bn} bk={bk}",
                   lambda xx, bn=bn, bk=bk: run(planC_kernel, xx, 8, bn, bk, planeC=True))


def planC2_kernel(xpm_ref, w_ref, s_ref, z_ref, o_ref, acc, *, bm, bn, bk, gs):
    """Like planC but planes reshaped (c,t,bn) then stacked on axis=1."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    t_rows = gs // 4
    planes = [pltpu.bitcast(((w >> (4 * j)) & NIBMASK) | MAGIC, jnp.bfloat16)
              .reshape(c, t_rows, bn) for j in range(4)]
    bg = jnp.stack(planes, axis=1).reshape(c, gs, bn)
    x_blk = xpm_ref[...]
    xg = x_blk.reshape(bm, c, gs).swapaxes(0, 1)
    raw = jax.lax.dot_general(xg, bg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum((raw - xs * zrow) * srow, axis=0)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def planC3_kernel(xpm_ref, w_ref, s_ref, z_ref, o_ref, acc, bscr, *, bm, bn, bk, gs):
    """Planes written into a VMEM scratch strip per j (no stack op)."""
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    w = w_ref[...]
    c = bk // gs
    r = bk // 4
    t_rows = gs // 4
    for j in range(4):
        v = pltpu.bitcast(((w >> (4 * j)) & NIBMASK) | MAGIC, jnp.bfloat16)
        bscr[:, j, :, :] = v.reshape(c, t_rows, bn)
    bg = bscr[...].reshape(c, gs, bn)
    x_blk = xpm_ref[...]
    xg = x_blk.reshape(bm, c, gs).swapaxes(0, 1)
    raw = jax.lax.dot_general(xg, bg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    xs = jnp.sum(xg.astype(jnp.float32), axis=2)[:, :, None]
    srow = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    zrow = z_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
    acc[...] += jnp.sum((raw - xs * zrow) * srow, axis=0)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


def run3(kern_fn, xx, bm, bn, bk, extra_scratch=None):
    xp = jnp.pad(xx, ((0, bm - xx.shape[0]), (0, 0)))
    t_rows = GS // 4
    xin = xp.reshape(bm, G, t_rows, 4).swapaxes(2, 3).reshape(bm, K)
    kern = functools.partial(kern_fn, bm=bm, bn=bn, bk=bk, gs=GS)
    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    if extra_scratch:
        scratch.append(extra_scratch(bn, bk))
    out = pl.pallas_call(
        kern, grid=(N // bn, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j)),
                  pl.BlockSpec((G, bn), lambda j, k: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xin, Wp, s_t, zoff_t)
    return out[:1]


if __import__("os").environ.get("MICRO"):
    for bn, bk in [(2048, 1024), (4096, 1024), (2048, 2048)]:
        check_and_time(f"planC2 bn={bn} bk={bk}",
                       lambda xx, bn=bn, bk=bk: run3(planC2_kernel, xx, 8, bn, bk))
    for bn, bk in [(2048, 1024), (4096, 1024), (2048, 2048)]:
        check_and_time(
            f"planC3 bn={bn} bk={bk}",
            lambda xx, bn=bn, bk=bk: run3(
                planC3_kernel, xx, 8, bn, bk,
                extra_scratch=lambda bn, bk: pltpu.VMEM(
                    (bk // GS, 4, GS // 4, bn), jnp.bfloat16)))
