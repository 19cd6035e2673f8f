# SPDX-License-Identifier: Apache-2.0
"""Real-Mosaic validation of the exact int8 decode kernel variants.

Runs each supported (kind, grouping) form on the live TPU and asserts the
same int32-exact semantics the CPU interpret tests pin (test_int8_exact.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.ops.pallas_int8 import (
        can_use_int8_decode, pallas_int8_decode, select_int8_decode_config)

    N, K = 1024, 4096
    rng = np.random.default_rng(0)

    def check(tag, layer, want_fn, M=8, tol=1e-5):
        meta = layer.meta
        cfg = select_int8_decode_config(meta, M, N, K)
        assert can_use_int8_decode(meta, M, N, K, cfg), (tag, meta, cfg)
        x = rng.integers(-128, 128, size=(M, K)).astype(np.int8)
        sx = np.full((M, 1), 1.0, np.float32)
        y = pallas_int8_decode(jnp.asarray(x), layer.W_q, layer.scales,
                               layer.zeros, jnp.asarray(sx), meta, cfg,
                               interpret=False)
        want = want_fn(x)
        got = np.asarray(y, np.float64)
        rel = np.max(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-9)
        print(f"{tag}: rel={rel:.3g}", flush=True)
        assert rel < tol, (tag, rel)

    # W8 grouped asym (the new unrolled flat-dot path)
    for gs in (64, 128):
        codes = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
        G = K // gs
        s = (rng.uniform(0.5, 1.5, (N, G)) * 2.0**-10).astype(np.float32)
        z = rng.integers(0, 256, (N, G)).astype(np.float32)
        layer = GemLiteLinear(8, gs, K, N, DType.INT8, DType.FP32,
                              scaled_activations=True).pack(
            codes, s, z, fma_mode=False)

        def want(x, codes=codes, s=s, z=z, G=G, gs=gs):
            xg = x.reshape(-1, G, gs).astype(np.int64)
            wg = codes.reshape(N, G, gs).astype(np.int64)
            raw = np.einsum("mgk,ngk->mgn", xg, wg)
            corr = raw - z.T[None].astype(np.int64) * xg.sum(2)[:, :, None]
            return (corr.astype(np.float64) * s.T[None]).sum(axis=1)
        check(f"w8-grouped gs={gs}", layer, want)

    # W4 grouped asym (batched byte-plane path — regression guard)
    gs = 128
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // gs
    s = (rng.uniform(0.5, 1.5, (N, G)) * 2.0**-8).astype(np.float32)
    z = rng.integers(0, 16, (N, G)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(codes, s, z,
                                                        fma_mode=False)

    def want4(x):
        xg = x.reshape(-1, G, gs).astype(np.int64)
        wg = codes.reshape(N, G, gs).astype(np.int64)
        raw = np.einsum("mgk,ngk->mgn", xg, wg)
        corr = raw - z.T[None].astype(np.int64) * xg.sum(2)[:, :, None]
        return (corr.astype(np.float64) * s.T[None]).sum(axis=1)
    check("w4-grouped gs=128", layer, want4)

    # W8 packed scalar-zero flat path (bit-exact)
    codes = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
    layer = GemLiteLinear(8, None, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(
        codes, np.ones((N, 1), np.float32), 128)

    def want8(x):
        return x.astype(np.int64) @ (codes.astype(np.int64) - 128).T
    meta = layer.meta
    cfg = select_int8_decode_config(meta, 8, N, K)
    x = rng.integers(-128, 128, size=(8, K)).astype(np.int8)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q,
                           jnp.ones((1, N), jnp.float32), layer.zeros,
                           jnp.ones((8, 1), jnp.float32), meta, cfg,
                           interpret=False)
    np.testing.assert_array_equal(np.asarray(y, np.float64), want8(x))
    print("w8-flat scalar-zero: bit-exact", flush=True)
    print("INT8 TPU CHECK OK", flush=True)




def main_cw():
    """Channel-wise nibble (cw) path: BitNet W2 scalar-zero + channel-wise
    W4 strip zeros, int32 bit-exact on the live chip."""
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    from gemlite_tpu import DType
    from gemlite_tpu.helper import A8W158_INT_dynamic
    from gemlite_tpu.ops.pallas_int8 import (
        can_use_int8_decode, pallas_int8_decode, select_int8_decode_config)

    N, K = 1024, 4096
    rng = np.random.default_rng(3)
    w = rng.integers(-1, 2, size=(N, K)).astype(np.float32)
    layer = A8W158_INT_dynamic(dtype=jnp.float32).from_weights(w, 0.01)
    meta = layer.meta
    M = 8
    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), (meta, cfg)
    x = rng.integers(-128, 128, size=(M, K)).astype(np.int8)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q,
                           jnp.ones((1, N), jnp.float32), layer.zeros,
                           jnp.ones((M, 1), jnp.float32), meta, cfg,
                           interpret=False)
    want = x.astype(np.int64) @ w.astype(np.int64).T
    np.testing.assert_array_equal(np.asarray(y, np.float64),
                                  want.astype(np.float64))
    print("bitnet-cw W2: bit-exact", flush=True)


if __name__ == "__main__":
    if "--cw-only" in sys.argv:
        main_cw()
    else:
        main()
        main_cw()
