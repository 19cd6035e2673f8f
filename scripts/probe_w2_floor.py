# SPDX-License-Identifier: Apache-2.0
"""Probe: is A16W2 decode (381 GB/s, 46.5% of HBM roofline in BENCH_MATRIX)
bandwidth-limited, tuning-limited, or VPU-op-limited?

Hypothesis: sub-nibble decode is bound by the UNPACK op count, which is
constant per VALUE (each bf16 output lane needs its shift/mask/or triple
regardless of bit-width), not per byte. At W2 the 4096^2 weight stream is
only 4.2 MB, so the ~1.5 VPU ops/value floor (16.7M values) dominates the
memory time. Prediction: W1/W2/W4 decode at the same (N, K) take the SAME
wall time (ops constant, bytes halving), so reported GB/s halves with the
bit-width — a physics floor, not a tuning gap.

Separation argument (why fewer planes are impossible for arbitrary x):
y = sum_k x_k c_k needs each code with its own x weight; a plane holding a
container of j codes only ever contributes sum_j 4^j * x~ * c_j — a FIXED
linear combination — so any container scheme serves arbitrary x only with
one dot per code position, i.e. >= one plane per value slot. The 3-op
(shift/and/or-magic) extraction per halfword pair is already minimal.

Measures, at 4096^2 gs=128 M=1 on the real chip:
  W4 / W2 / W1 decode          - the shipped kernel at each width
  stream2                      - same W2 byte volume, 2-plane dummy unpack
                                 (bitcast only): the pure-bandwidth floor
Writes nothing; paste results into CEILING.md's W2 section.

Usage: python scripts/probe_w2_floor.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.core import forward_functional
    from bench import timed_slopes

    quick = "--quick" in sys.argv
    n1, n2 = (100, 400) if quick else (200, 800)
    N = K = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    fns, meta_bytes = {}, {}
    for nb in (4, 2, 1):
        W_q = rng.integers(0, 2 ** nb, size=(N, K)).astype(np.uint8)
        G = N * K // 128
        scales = (2.0 ** rng.integers(-10, -6, (G, 1))).astype(np.float32)
        zeros = rng.integers(0, 2 ** nb, (G, 1)).astype(np.float32)
        lay = GemLiteLinear(nb, 128, K, N, DType.BF16, DType.BF16).pack(
            W_q, scales, zeros)
        meta = lay.meta
        tensors = tuple(lay.get_tensor_args())

        def run(xx, meta=meta, tensors=tensors):
            return forward_functional(xx, None, list(tensors), meta)

        jax.block_until_ready(jax.jit(run)(x))
        fns[f"W{nb} decode"] = (jax.jit(run), x)
        meta_bytes[f"W{nb} decode"] = (K * N * nb // 8
                                       + G * 8 + K * 2 + N * 2)

    # pure-stream floor at the W2 byte volume: same int32 blocks, 2 dummy
    # bitcast planes (no shifts/masks), one flat dot — bandwidth-only
    bn, bk = 2048, 1024
    Wq2 = jnp.asarray(
        rng.integers(0, 2 ** 62, size=(K // 16, N)).astype(np.int64)
        .astype(np.int32))
    s1 = jnp.asarray(rng.normal(size=(1, N)), jnp.float32)

    def make_stream():
        n_k = K // bk
        rows = bk // 16   # W2 packing: 16 codes per int32 row

        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            w = w_ref[...]
            bg = pltpu.bitcast(w, jnp.bfloat16).reshape(2 * rows, bn)
            raw = jax.lax.dot_general(
                x_ref[...], bg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] += raw

            @pl.when(k == n_k - 1)
            def _():
                o_ref[...] = (acc_ref[...] * s_ref[...]).astype(jnp.bfloat16)

        return pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((1, 2 * rows), lambda j, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, bn), lambda j, k: (k, j),
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

    f = make_stream()
    xs = jnp.zeros((1, 2 * (K // 16)), jnp.bfloat16)

    def run_stream(xx, f=f):
        return f(xs, Wq2, s1)

    jax.block_until_ready(run_stream(x))
    fns["stream2 (W2 bytes)"] = (run_stream, x)
    meta_bytes["stream2 (W2 bytes)"] = K * N * 2 // 8 + N * 4 + K // 4

    dts = timed_slopes(fns, n1, n2)
    print(f"{'variant':<20s} {'time':>9s} {'GB/s':>8s}  bytes")
    for v, dt in dts.items():
        nb = meta_bytes[v]
        print(f"{v:<20s} {dt*1e6:8.2f}us {nb/dt/1e9:7.1f}  {nb/1e6:.1f} MB",
              flush=True)


if __name__ == "__main__":
    main()
