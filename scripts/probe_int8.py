# SPDX-License-Identifier: Apache-2.0
"""int8-exact decode probe: Mosaic int8 building blocks + prototype kernel.

Checks, on real Mosaic:
  A. pltpu.bitcast int32 -> int8 row order (expect little-endian: byte b of
     word row i lands at int8 row 4i + b)
  B. batched int8 x int8 -> int32 dot_general
  C. W4 even/odd nibble byte-planes -> (c, gs, bn) int8 stack
  D. prototype A8W8 + A8W4 decode kernels: bit-exactness vs int32 numpy
     reference and timing vs the bf16 plane kernel
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
from scripts.probe_fold import timed_robust, report


def test_bitcast_i8():
    w = jnp.asarray(np.array([[0x04030201, 0x08070605]], np.int32).T)  # (2,1)
    w = jnp.broadcast_to(w, (2, 128)).copy()

    def kern(w_ref, o_ref):
        o_ref[...] = pltpu.bitcast(w_ref[...], jnp.int8).astype(jnp.int32)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((2, 128), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(w)
    col = np.asarray(out)[:, 0]
    print("A bitcast i8 rows:", col, "(expect 1..8 ascending if little-endian)")
    sys.stdout.flush()
    return list(col) == [1, 2, 3, 4, 5, 6, 7, 8]


def make_int8_kernel(W_nbits, bm, bn, bk, gs, n_k, zero_is_scalar, mode):
    P = 8 // W_nbits if W_nbits < 8 else 1
    t8 = gs // max(P, 1)
    c = bk // gs
    off8 = 128 if W_nbits == 8 else 0
    nib_mask = {4: 0x0F0F0F0F, 2: 0x03030303}.get(W_nbits)

    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[...]
        if W_nbits == 8:
            bg = pltpu.bitcast(w ^ jnp.int32(-2139062144), jnp.int8)  # 0x80808080
            bg = bg.reshape(c, gs, bn)
        else:
            planes = [
                pltpu.bitcast((w >> (W_nbits * p)) & nib_mask,
                              jnp.int8).reshape(c, t8, bn)
                for p in range(P)
            ]
            bg = jnp.stack(planes, axis=1).reshape(c, gs, bn)

        xg = x_ref[...]                                     # (c, bm, gs) int8
        raw = jax.lax.dot_general(
            xg, bg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)               # (c, bm, bn)
        xs = jnp.sum(xg.astype(jnp.int32), axis=2)[:, :, None]

        if mode == 1:  # shift only, scalar z: int-exact all the way
            z = z_ref[0, 0]
            acc_ref[...] += jnp.sum(raw + (off8 - z) * xs, axis=0)
        else:          # mode 3 grouped: int per group, f32 scale
            s3 = s_ref[pl.ds(k * c, c), :].astype(jnp.float32)[:, None, :]
            z3 = z_ref[pl.ds(k * c, c), :][:, None, :]
            contrib = (raw + (off8 - z3) * xs).astype(jnp.float32) * s3
            acc_ref[...] += jnp.sum(contrib, axis=0).astype(acc_ref.dtype)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    return kernel


def run_int8(xq, Wp, s, z, W_nbits, bm, bn, bk, gs, mode, out_dtype, acc_dtype):
    K = xq.shape[0] * gs  # xq (G, bm, gs)
    N = Wp.shape[1]
    n_k = K // bk
    c = bk // gs
    G = K // gs
    elems = 32 // W_nbits
    zspec = (pl.BlockSpec((1, 1), lambda j, k: (0, 0), memory_space=pltpu.SMEM)
             if mode == 1 else
             pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        make_int8_kernel(W_nbits, bm, bn, bk, gs, n_k, mode == 1, mode),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((c, bm, gs), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // elems, bn), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
            zspec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xq, Wp, s, z)


def permute_x_int(x, P, gs):
    M, K = x.shape
    if P <= 1:
        return x
    t = gs // P
    G = K // gs
    return x.reshape(M, G, t, P).swapaxes(2, 3).reshape(M, K)


def main():
    ok = test_bitcast_i8()
    if not ok:
        print("bitcast order NOT little-endian — stopping")
        return

    N = K = 4096
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, size=(1, K)).astype(np.int8)

    # ---- A8W8, mode 1 (scalar zero 128), channelwise scales epilogue ----
    Wq8 = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
    Wp8, _ = pack_weights_over_cols(jnp.asarray(Wq8), 8, 32, transpose=True)
    gs = 512  # channelwise fold unit analog: groups of 512, shared meta rows
    G = K // gs
    z8 = 128
    ref_i32 = (x.astype(np.int64) @ (Wq8.astype(np.int64) - z8).T)  # (1, N)

    bm, bn, bk = 8, 2048, 1024
    xq = jnp.asarray(np.broadcast_to(x, (bm, K)).copy())
    xq3 = xq.reshape(bm, G, gs).transpose(1, 0, 2)  # (G, bm, gs) natural (P=1)
    s_dummy = jnp.ones((G, N), jnp.float32)
    z_s = jnp.asarray([[z8]], jnp.int32)
    try:
        y = run_int8(xq3, Wp8, s_dummy, z_s, 8, bm, bn, bk, gs, 1,
                     jnp.int32, jnp.int32)
        exact = np.array_equal(np.asarray(y)[0], ref_i32[0].astype(np.int32))
        print("D A8W8 mode1 BIT-EXACT:", exact)
        f = lambda xx: run_int8(xx, Wp8, s_dummy, z_s, 8, bm, bn, bk, gs, 1,
                                jnp.int32, jnp.int32)
        dt = timed_robust(f, xq3)
        report("D A8W8 int8 decode", dt, K * N + G * N * 4 + K + N * 4)
    except Exception as e:
        print("D A8W8 FAILED:", str(e)[-600:])
    sys.stdout.flush()

    # ---- A8W4, mode 3 (grouped int zeros + f32 scales) ------------------
    gs4 = 128
    G4 = K // gs4
    Wq4 = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    z4 = rng.integers(0, 16, size=(N, G4)).astype(np.int32)
    s4 = rng.uniform(2.0**-11, 2.0**-8, size=(N, G4)).astype(np.float32)
    Wp4, _ = pack_weights_over_cols(jnp.asarray(Wq4), 4, 32, transpose=True)
    # int32 groupwise reference: raw_g int, then f32 scale
    xg_np = x.reshape(1, G4, gs4).astype(np.int64)
    wg_np = Wq4.reshape(N, G4, gs4).astype(np.int64)
    raw_g = np.einsum("mgk,ngk->mgn", xg_np, wg_np)
    xs_g = xg_np.sum(axis=2)                                 # (1, G4)
    ref4 = ((raw_g - z4.T[None] * xs_g[:, :, None]).astype(np.float32)
            * s4.T[None]).sum(axis=1)
    xp = permute_x_int(np.broadcast_to(x, (bm, K)).copy(), 2, gs4)
    xq4 = jnp.asarray(xp).reshape(bm, G4, gs4).transpose(1, 0, 2)
    try:
        y = run_int8(xq4, Wp4, jnp.asarray(s4.T), jnp.asarray(z4.T), 4,
                     bm, bn, bk, gs4, 3, jnp.float32, jnp.float32)
        got = np.asarray(y)[0]
        d = np.max(np.abs(got - ref4[0]))
        rel = d / (np.mean(np.abs(ref4)) + 1e-9)
        print(f"D A8W4 mode3 maxdiff={d:.3e} rel={rel:.2e} "
              f"(f32-exact expected: diff 0)")
        f = lambda xx: run_int8(xx, Wp4, jnp.asarray(s4.T), jnp.asarray(z4.T),
                                4, bm, bn, bk, gs4, 3, jnp.float32, jnp.float32)
        dt = timed_robust(f, xq4)
        report("D A8W4 int8 decode", dt, K * N // 2 + G4 * N * 8 + K + N * 4)
    except Exception as e:
        print("D A8W4 FAILED:", str(e)[-600:])
    sys.stdout.flush()


if __name__ == "__main__":
    main()
