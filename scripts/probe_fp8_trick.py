# SPDX-License-Identifier: Apache-2.0
"""Probe: gradual-underflow fp8 decode — 4 VPU ops/value, exact IF the MXU
multiplies bf16 subnormal inputs without flushing.

Trick: for an e4m3 code (s, E, m), the bf16 bit pattern ``(me << 4) | s<<15``
(me = low 7 bits) decodes to ``true_value * 2**-120`` EXACTLY for BOTH
normals and subnormals: exp field = E, so E=0 lands on a bf16 SUBNORMAL whose
gradual underflow reproduces m * 2**-9 * 2**-120 bit-for-bit. The 2**120
rescale folds into the post-dot channel scale; to keep x*w products above the
f32 flush threshold, x pre-scales by 2**60 and the epilogue applies the other
2**60 (flushed-term error bound < K * 2**-126 * 2**60 ~ 2**-54, negligible).

This probe measures (a) whether the MXU honors bf16 subnormal multiplicands
(exhaustive 256-code dequant check vs ml_dtypes), (b) the decode-kernel speed
vs the shipped subnormal-cascade remap at the A8W8-FP8 headline point.

Usage: python scripts/probe_fp8_trick.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import ml_dtypes
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import timed_slopes

    quick = "--quick" in sys.argv
    n1, n2 = (100, 400) if quick else (200, 800)

    # ---- (a) exhaustive correctness: dot picks out each dequantized code --
    # W column n holds code (n % 256); x = one-hot rows -> y[i, n] = deq(code)
    K = 256
    N = 512
    codes = np.tile(np.arange(256, dtype=np.uint8), (K, N // 256)).reshape(K, N)
    W_pack = jnp.asarray(
        codes.reshape(K // 4, 4, N)[:, 0].astype(np.uint32)
        | (codes.reshape(K // 4, 4, N)[:, 1].astype(np.uint32) << 8)
        | (codes.reshape(K // 4, 4, N)[:, 2].astype(np.uint32) << 16)
        | (codes.reshape(K // 4, 4, N)[:, 3].astype(np.uint32) << 24),
        jnp.uint32).astype(jnp.int32)
    # NOTE codes above differ per (k, n)? make k-independent: every row same
    # code per column, x = ones/K picks the average = the value itself.
    x1 = jnp.full((1, K), 2.0 ** 60 / K, jnp.bfloat16)  # pre-scaled x

    def trick_planes(w, c, t_rows, bn):
        planes = []
        for j in range(2):
            t8 = (w >> (8 * j)) & 0x00FF00FF
            bits = ((t8 & 0x007F007F) << 4) | ((t8 & 0x00800080) << 8)
            planes.append(pltpu.bitcast(bits, jnp.bfloat16)
                          .reshape(c, t_rows, bn))
        return planes

    def make_exhaustive():
        c, t_rows, bn = 1, K // 2, N

        def kern(x_ref, w_ref, o_ref):
            planes = trick_planes(w_ref[...], c, t_rows, bn)
            bg = jnp.stack(planes, axis=1).reshape(c, K, bn)
            xg = x_ref[...]
            raw = jax.lax.dot_general(
                xg, bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[...] = (raw[0] * 2.0 ** 60).astype(jnp.float32)

        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((1, 1, K), lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 4, N), lambda: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, N), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        )

    # x must hit the PERMUTED k order: folded P=2 halfword planes interleave
    # k as (plane, row) -> value at k = 2*r + j is byte j of halfword r.
    # With all rows equal per column, any x order gives the same mean.
    f = make_exhaustive()
    y = np.asarray(f(x1.reshape(1, 1, K), W_pack))[0]
    want = codes[0].view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    # e4m3fn NaN code (S.1111.111) decodes as +-480 under the affine formula
    fin = np.isfinite(want)
    ok = np.array_equal(y[fin], want[fin])
    print(f"exhaustive e4m3 dequant exact (finite codes): {ok}", flush=True)
    if not ok:
        bad = np.where(y[fin] != want[fin])[0]
        print("  first mismatches:", [(int(b), float(y[fin][b]),
                                       float(want[fin][b]))
                                      for b in bad[:8]], flush=True)
        sub = (codes[0][fin] & 0x78) == 0
        badm = y[fin] != want[fin]
        print(f"  mismatches on subnormal codes: {int((badm & sub).sum())}"
              f" / {int(sub.sum())}; on normal codes:"
              f" {int((badm & ~sub).sum())}", flush=True)

    # ---- (b) perf at the A8W8-FP8 headline point ------------------------
    K = N = 4096
    rng = np.random.default_rng(0)
    cb = rng.integers(0, 256, size=(K // 4, N), dtype=np.uint32)
    Wq = jnp.asarray((cb | (cb << 8) | (cb << 16) | (cb << 24)).astype(
        np.int64) - 2**31, jnp.int32)  # junk codes, right byte volume
    x = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((1, N)) * 0.01 + 1, jnp.float32)

    import gemlite_tpu.ops.pallas_decode as pd

    def make_perf(variant, bn, bk):
        c = 1
        t_rows = bk // 2
        n_k = K // bk

        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            w = w_ref[...]
            if variant == "trick":
                planes = trick_planes(w, c, t_rows, bn)
            else:
                planes = pd._fp8_planes(w, c, t_rows, bn)
            bg = jnp.stack(planes, axis=1).reshape(c, bk, bn)
            raw = jax.lax.dot_general(
                x_ref[...], bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[...] += raw[0]

            @pl.when(k == n_k - 1)
            def _():
                sc = 2.0 ** 60 if variant == "trick" else 1.0
                o_ref[...] = (acc_ref[...] * s_ref[...] * sc
                              ).astype(jnp.bfloat16)

        return pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((1, 1, bk), lambda j, k: (0, 0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 4, bn), lambda j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, k: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    fns = {}
    for name, variant, bn, bk in (
        ("trick_2048x1024", "trick", 2048, 1024),
        ("trick_1024x2048", "trick", 1024, 2048),
        ("trick_1024x4096", "trick", 1024, 4096),
        ("cascade_2048x1024", "cascade", 2048, 1024),
        ("cascade_1024x2048", "cascade", 1024, 2048),
    ):
        try:
            f = make_perf(variant, bn, bk)

            def run(xx, f=f, variant=variant):
                xs = xx * 2.0 ** 60 if variant == "trick" else xx
                return f(xs.reshape(1, 1, K), Wq, s)

            jax.block_until_ready(run(x))
            fns[name] = (run, x)
        except Exception as e:  # noqa: BLE001 - probe: report and move on
            print(f"{name:<18s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    dts = timed_slopes(fns, n1, n2)
    nbytes = K * N + N * 4 + K * 2
    for v, dt in dts.items():
        print(f"{v:<18s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
