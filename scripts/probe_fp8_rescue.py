# SPDX-License-Identifier: Apache-2.0
"""Probe: rescue the gradual-underflow fp8 decode from the MXU's bf16
subnormal flush (probe_fp8_trick.py: normals exact, subnormals -> 0).

Idea: the trick plane ``bitcast((me<<4)|sgn)`` holds true_value * 2**-120
with fp8-subnormals landing on bf16 SUBNORMALS. A single VPU multiply by
2**110 BEFORE the dot renormalizes every value into the bf16 normal range
(max 448*2**-10, min 2**-133 * 2**110 = 2**-23) — exact iff the VPU multiply
itself honors subnormal inputs (TPU VPUs compute bf16 via f32 upconvert, so
gradual underflow plausibly survives where the MXU flushes).

Variants (exhaustive 256-code dequant check + perf at 4096^2 M=1):
  vmul      - trick plane * bf16(2**110), post-scale 2**10 (split in x)
  vmul_f32  - trick plane -> f32 multiply by 2**110, cast bf16, same post

Usage: python scripts/probe_fp8_rescue.py [--quick]
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

    RESC = jnp.bfloat16(2.0 ** 110)

    def planes_for(variant, w, c, t_rows, bn):
        planes = []
        for j in range(2):
            t8 = (w >> (8 * j)) & 0x00FF00FF
            sgn = (t8 & 0x00800080) << 8
            bits = ((t8 & 0x007F007F) << 4) | sgn
            if variant == "vmul":
                v = pltpu.bitcast(bits, jnp.bfloat16) * RESC
            else:  # vmul_f32
                v = (pltpu.bitcast(bits, jnp.bfloat16).astype(jnp.float32)
                     * jnp.float32(2.0 ** 110)).astype(jnp.bfloat16)
            planes.append(v.reshape(c, t_rows, bn))
        return planes

    # ---- exhaustive correctness --------------------------------------
    K, N = 256, 512
    codes = np.tile(np.arange(256, dtype=np.uint8), (K, N // 256)).reshape(K, N)
    cr = codes.reshape(K // 4, 4, N)
    # bit-preserving uint32 -> int32 (mod-2^32 wrap keeps bits; NEVER subtract
    # 2**31 — that XORs bit 31, flipping byte-3's fp8 sign)
    W_pack = jnp.asarray(
        cr[:, 0].astype(np.uint32) | (cr[:, 1].astype(np.uint32) << 8)
        | (cr[:, 2].astype(np.uint32) << 16)
        | (cr[:, 3].astype(np.uint32) << 24),
        jnp.uint32).astype(jnp.int32)
    x1 = jnp.full((1, K), 2.0 ** 5 / K, jnp.bfloat16)  # post 2**5: 110+5+5

    def make_exhaustive(variant):
        c, t_rows, bn = 1, K // 2, N

        def kern(x_ref, w_ref, o_ref):
            planes = planes_for(variant, w_ref[...], c, t_rows, bn)
            bg = jnp.stack(planes, axis=1).reshape(c, K, bn)
            raw = jax.lax.dot_general(
                x_ref[...], bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[...] = (raw[0] * 2.0 ** 5).astype(jnp.float32)

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

    want = codes[0].view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    fin = np.isfinite(want)
    for variant in ("vmul", "vmul_f32"):
        try:
            y = np.asarray(make_exhaustive(variant)(
                x1.reshape(1, 1, K), W_pack))[0]
            ok = np.array_equal(y[fin], want[fin])
            print(f"{variant:<9s} exhaustive exact: {ok}", flush=True)
            if not ok:
                bad = np.where(y[fin] != want[fin])[0]
                print("  first:", [(int(b), float(y[fin][b]),
                                    float(want[fin][b])) for b in bad[:6]],
                      flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:<9s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---- perf at 4096^2 M=1 ------------------------------------------
    K = N = 4096
    rng = np.random.default_rng(0)
    cb = rng.integers(0, 2**32, size=(K // 4, N), dtype=np.uint64)
    Wq = jnp.asarray(cb.astype(np.uint32), jnp.uint32).astype(jnp.int32)
    x = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((1, N)) * 0.01 + 1, jnp.float32)

    def make_perf(variant, bn, bk):
        c, t_rows, n_k = 1, bk // 2, K // bk

        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            planes = planes_for(variant, w_ref[...], c, t_rows, bn)
            bg = jnp.stack(planes, axis=1).reshape(c, bk, bn)
            raw = jax.lax.dot_general(
                x_ref[...], bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_ref[...] += raw[0]

            @pl.when(k == n_k - 1)
            def _():
                o_ref[...] = (acc_ref[...] * s_ref[...] * 2.0 ** 5
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
        ("vmul_2048x1024", "vmul", 2048, 1024),
        ("vmul_1024x2048", "vmul", 1024, 2048),
        ("vmulf32_2048x1024", "vmul_f32", 2048, 1024),
    ):
        try:
            f = make_perf(variant, bn, bk)

            def run(xx, f=f):
                return f((xx * 2.0 ** 5).reshape(1, 1, K), Wq, s)

            jax.block_until_ready(run(x))
            fns[name] = (run, x)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<18s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    dts = timed_slopes(fns, n1, n2)
    nbytes = K * N + N * 4 + K * 2
    for v, dt in dts.items():
        print(f"{v:<18s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
