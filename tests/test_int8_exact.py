# SPDX-License-Identifier: Apache-2.0
"""Exact int8 decode path (ops/pallas_int8.py) vs int32 references.

The reference INT kernels accumulate int8 products in int32 exactly
(gemm_splitK_kernels.py:278-450); these tests pin our fast decode path to
the same semantics: with unit scales the outputs ARE the int32 sums
(asserted bit-equal), and with real scales the integer part is complete
before any float multiply (asserted to f32-epilogue rounding only).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gemlite_tpu import DType, GemLiteLinear
from gemlite_tpu.helper import A8W8_INT8_dynamic
from gemlite_tpu.ops.pallas_int8 import (
    can_use_int8_decode,
    pallas_int8_decode,
    select_int8_decode_config,
)

N, K = 256, 512


def _x_int8(M, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-128, 128, size=(M, K)).astype(np.int8)


@pytest.mark.parametrize("M", [1, 8, 64])
def test_a8w8_symmetric_dense_int8_bit_exact(M):
    """A8W8 symmetric (mode 0, non-packed int8 weights, csm 3)."""
    rng = np.random.default_rng(1)
    W = (rng.normal(size=(N, K)) * 0.05).astype(np.float32)
    layer = A8W8_INT8_dynamic(dtype=jnp.float32).from_weights(W)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (0, 3)

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg)

    x = _x_int8(M)
    sx = np.full((M, 1), 1.0, np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, layer.scales, None,
                           jnp.asarray(sx), meta, cfg)
    # int32-exact raw sums, then f32 per-channel scale
    W_i8 = np.asarray(layer.W_q, np.int64)                    # (K, N)
    raw = x.astype(np.int64) @ W_i8                           # exact
    want = (raw.astype(np.float32)
            * np.asarray(layer.scales, np.float32).reshape(1, N))
    got = np.asarray(y, np.float32)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)

    # unit scales: the OUTPUT is the int32 accumulator, bit-exact
    ones = jnp.ones((1, N), jnp.float32)
    y2 = pallas_int8_decode(jnp.asarray(x), layer.W_q, ones, None,
                            jnp.asarray(sx), meta, cfg)
    np.testing.assert_array_equal(np.asarray(y2, np.float64),
                                  raw.astype(np.float64))


@pytest.mark.parametrize("M", [1, 16])
def test_w8_packed_scalar_zero_shift_bit_exact(M):
    """Packed W8 codes + channel-wise scales + scalar zero 128:
    mode 1 + csm 3 via the flat XOR-0x80 path."""
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
    scales = (rng.uniform(0.5, 1.5, (N, 1)) * 2.0**-9).astype(np.float32)
    layer = GemLiteLinear(8, None, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(codes, scales, 128)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (1, 3)

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), meta

    x = _x_int8(M, seed=3)
    sx = np.full((M, 1), 1.0, np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, jnp.ones((1, N), jnp.float32),
                           layer.zeros, jnp.asarray(sx), meta, cfg)
    raw = x.astype(np.int64) @ (codes.astype(np.int64) - 128).T
    np.testing.assert_array_equal(np.asarray(y, np.float64),
                                  raw.astype(np.float64))


@pytest.mark.parametrize("M", [1, 8])
@pytest.mark.parametrize("gs", [64, 128])
def test_w8_grouped_asym_int_zeros_exact(M, gs):
    """Packed W8 + grouped scales + INT zeros (fma_mode=False): mode 3 via
    statically-unrolled flat per-group int8 dots; each group's int part is
    exact before its f32 scale."""
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
    G = K // gs
    scales = (rng.uniform(0.5, 1.5, (N, G)) * 2.0**-10).astype(np.float32)
    zeros = rng.integers(0, 256, (N, G)).astype(np.float32)
    layer = GemLiteLinear(8, gs, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(
        codes, scales, zeros, fma_mode=False)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (3, 2)

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), (meta, cfg)

    x = _x_int8(M, seed=8)
    sx = (rng.uniform(0.5, 1.5, (M, 1)) * 2.0**-7).astype(np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, layer.scales,
                           layer.zeros, jnp.asarray(sx), meta, cfg)

    xg = x.reshape(M, G, gs).astype(np.int64)
    wg = codes.reshape(N, G, gs).astype(np.int64)
    raw_g = np.einsum("mgk,ngk->mgn", xg, wg)
    xs_g = xg.sum(axis=2)
    corr = raw_g - zeros.T[None].astype(np.int64) * xs_g[:, :, None]
    want = (corr.astype(np.float32) * scales.T[None]).sum(axis=1) * sx
    got = np.asarray(y, np.float32)
    rel = np.max(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-9)
    assert rel < 1e-5, rel


@pytest.mark.parametrize("M", [1, 8])
@pytest.mark.parametrize("gs", [64, 128])
def test_w4_grouped_asym_int_zeros_exact(M, gs):
    """Packed W4 + grouped scales + INT zeros (fma_mode=False): mode 3 via
    batched byte-plane group dots; the int part per group is exact."""
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // gs
    scales = (rng.uniform(0.5, 1.5, (N, G)) * 2.0**-8).astype(np.float32)
    zeros = rng.integers(0, 16, (N, G)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(
        codes, scales, zeros, fma_mode=False)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (3, 2)

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), meta

    x = _x_int8(M, seed=5)
    sx = (rng.uniform(0.5, 1.5, (M, 1)) * 2.0**-7).astype(np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, layer.scales,
                           layer.zeros, jnp.asarray(sx), meta, cfg)

    # groupwise int32-exact reference, f32 group scale, f32 token scale
    xg = x.reshape(M, G, gs).astype(np.int64)
    wg = codes.reshape(N, G, gs).astype(np.int64)
    raw_g = np.einsum("mgk,ngk->mgn", xg, wg)
    xs_g = xg.sum(axis=2)
    corr = raw_g - zeros.T[None].astype(np.int64) * xs_g[:, :, None]
    want = (corr.astype(np.float32) * scales.T[None]).sum(axis=1) * sx
    got = np.asarray(y, np.float32)
    rel = np.max(np.abs(got - want)) / (np.mean(np.abs(want)) + 1e-9)
    assert rel < 1e-5, rel


def test_w8_grouped_selector_respects_unroll_bound():
    """gs=32 on a deep K: the selector must pick a bk with bk//gs <= 16 so
    can_use accepts its own selection (previously bk=1024 -> c=32, and the
    exact path silently fell back to the bf16 kernels)."""
    rng = np.random.default_rng(9)
    Kd = 4096
    codes = rng.integers(0, 256, size=(N, Kd)).astype(np.uint8)
    G = Kd // 32
    scales = (rng.uniform(0.5, 1.5, (N, G)) * 2.0**-10).astype(np.float32)
    zeros = rng.integers(0, 256, (N, G)).astype(np.float32)
    layer = GemLiteLinear(8, 32, Kd, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(
        codes, scales, zeros, fma_mode=False)
    cfg = select_int8_decode_config(layer.meta, 8, N, Kd)
    assert cfg.block_k // 32 <= 16, cfg
    assert can_use_int8_decode(layer.meta, 8, N, Kd, cfg), (layer.meta, cfg)


def test_dispatch_routes_int8_layers():
    """The full forward path uses the exact kernel for INT8 layers (and the
    layer does not fold its packing)."""
    rng = np.random.default_rng(6)
    W = (rng.normal(size=(N, K)) * 0.05).astype(np.float32)
    layer = A8W8_INT8_dynamic(dtype=jnp.bfloat16).from_weights(W)
    assert layer.w_layout == 0
    x = jnp.asarray(rng.normal(size=(2, K)) * 0.5, jnp.bfloat16)
    y = layer(x)                      # forward_functional quantizes to int8
    assert y.shape == (2, N)
    # numerics sanity vs the float product
    want = np.asarray(x, np.float32) @ W.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - want)) / \
        (np.mean(np.abs(want)) + 1e-9)
    assert rel < 2e-2, rel


@pytest.mark.parametrize("M", [1, 8, 64])
def test_bitnet_channelwise_w2_exact(M):
    """BitNet A8W158: ternary codes (w+1 in {0,1,2}), scalar zero 1,
    channel-wise scale — the channel-wise nibble (cw) path accumulates
    int32-exactly (previously fell to the relaxed bf16 plane kernels)."""
    from gemlite_tpu.helper import A8W158_INT_dynamic
    rng = np.random.default_rng(11)
    w = rng.integers(-1, 2, size=(N, K)).astype(np.float32)
    layer = A8W158_INT_dynamic(dtype=jnp.float32).from_weights(w, 0.01)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (1, 3)
    assert meta.W_nbits == 2 and meta.zero_is_scalar

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), (meta, cfg)

    x = _x_int8(M, seed=12)
    sx = np.full((M, 1), 1.0, np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, jnp.ones((1, N), jnp.float32),
                           layer.zeros, jnp.asarray(sx), meta, cfg)
    raw = x.astype(np.int64) @ w.astype(np.int64).T     # codes - 1 == w
    np.testing.assert_array_equal(np.asarray(y, np.float64),
                                  raw.astype(np.float64))


@pytest.mark.parametrize("M", [1, 8])
def test_channelwise_w4_nibble_exact(M):
    """Channel-wise W4 + channel-wise zeros (mode 1 + csm 3): cw nibble path."""
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = (rng.uniform(0.5, 1.5, (N, 1)) * 2.0**-8).astype(np.float32)
    zeros = rng.integers(0, 16, (N, 1)).astype(np.float32)
    layer = GemLiteLinear(4, None, K, N, DType.INT8, DType.FP32,
                          scaled_activations=True).pack(codes, scales, zeros)
    meta = layer.meta
    assert (meta.W_group_mode, meta.channel_scale_mode) == (1, 3)

    cfg = select_int8_decode_config(meta, M, N, K)
    assert can_use_int8_decode(meta, M, N, K, cfg), (meta, cfg)

    x = _x_int8(M, seed=14)
    sx = np.full((M, 1), 1.0, np.float32)
    y = pallas_int8_decode(jnp.asarray(x), layer.W_q, jnp.ones((1, N), jnp.float32),
                           layer.zeros, jnp.asarray(sx), meta, cfg)
    raw = x.astype(np.int64) @ (codes.astype(np.int64) - zeros.astype(np.int64)).T
    np.testing.assert_array_equal(np.asarray(y, np.float64),
                                  raw.astype(np.float64))


def test_int8_exact_coverage_real_configs():
    """Every helper-producible INT8-activation decode config on real model
    shapes lands on the exact int8 kernel (no silent bf16 fallback).
    The residual non-exact configs are documented in COVERAGE.md."""
    llama_shapes = [(4096, 4096), (4096, 14336), (14336, 4096),
                    (4096, 6144), (8192, 8192), (8192, 28672)]
    # (W_nbits, gs, W_group_mode, csm, elems, zero_is_scalar) per helper path
    def metas_for(K, N):
        out = []
        # A8W8_INT8_dynamic: dense int8, mode 0, csm 3
        out.append(("A8W8 dense", LayerMetaLike(8, K, 1, 0, 3, K, N, 0)))
        # BitNet A8W158: W2 packed, scalar zero, mode 1 csm 3
        out.append(("BitNet W2", LayerMetaLike(2, K, 16, 1, 3, K, N, 1)))
        # channel-wise W4 asym int zeros: mode 1 csm 3
        out.append(("cw W4", LayerMetaLike(4, K, 8, 1, 3, K, N, 0)))
        # grouped W4/W2/W8 + int zeros (fma_mode=False): mode 3 csm 2
        for nb, gs in [(4, 64), (4, 128), (2, 128), (8, 64), (8, 128)]:
            out.append((f"W{nb} gs{gs}",
                        LayerMetaLike(nb, gs, 32 // nb, 3, 2, K, N, 0)))
        return out

    from gemlite_tpu.core import LayerMeta
    def LayerMetaLike(nb, gs, elems, mode, csm, K, N, zscal):
        return LayerMeta(
            scaled_activations=1, W_nbits=nb, group_size=gs,
            unpack_mask=2**nb - 1, elements_per_sample=elems,
            input_dtype=DType.INT8.value, output_dtype=DType.FP32.value,
            acc_dtype=DType.INT32.value, meta_dtype=DType.FP32.value,
            channel_scale_mode=csm, W_group_mode=mode, data_contiguous=1,
            in_features=K, out_features=N, zero_is_scalar=zscal,
            packing_bitwidth=32)

    holes = []
    for K, N in llama_shapes:
        for name, meta in metas_for(K, N):
            for M in (1, 2, 4, 8, 16, 32, 64):
                cfg = select_int8_decode_config(meta, M, N, K)
                if not can_use_int8_decode(meta, M, N, K, cfg):
                    holes.append((name, M, N, K))
    assert not holes, f"exact-path holes: {holes[:20]}"
