# SPDX-License-Identifier: Apache-2.0
"""Decode-regime plane raw-dot kernel vs the jnp oracle (interpret mode).

Covers the reference test matrix for the M<=64 regime
(test_gemlitelineartriton.py:87-244): all W_group_modes, W in {1,2,4},
group sizes, scalar zeros, channel-scale epilogues, batch sizes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu.config import KernelConfig
from gemlite_tpu.ops.pallas_decode import (
    pallas_decode_matmul,
    can_use_decode_kernel,
    select_decode_config,
)
from gemlite_tpu.ops.dispatch import _ref_kernel


def gen_hqq_data(rng, N, K, W_nbits, group_size):
    """Exactly-representable HQQ-style synthetic data (reference
    test_gemlitelineartriton.py:25-39)."""
    W_q = rng.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    G = N * K // group_size
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
    zeros = rng.integers(0, 2**W_nbits, size=(G, 1)).astype(np.float32)
    W_deq = ((W_q.reshape(-1, group_size) - zeros) * scales).reshape(N, K)
    return W_q, scales, zeros, W_deq


def _run_both(layer, x, M, N, K):
    meta = layer.meta
    cfg = select_decode_config(meta, M, N, K)
    if not can_use_decode_kernel(meta, M, N, K, cfg):
        # group sizes below 128 violate the Mosaic lane rule -> the layer
        # must still produce correct results via the general-kernel fallback
        K_ = meta.in_features
        gs = meta.group_size if 1 < meta.group_size < K_ else K_
        assert min(gs, cfg.block_k) % 128 != 0, (cfg, meta.group_size)
        return layer(x), _ref_kernel(x, layer.W_q, layer.scales, layer.zeros,
                                     None, meta)
    got = pallas_decode_matmul(x, layer.W_q, layer.scales, layer.zeros, None,
                               meta, cfg, interpret=True)
    want = _ref_kernel(x, layer.W_q, layer.scales, layer.zeros, None, meta)
    return got, want


@pytest.mark.parametrize("W_nbits,group_size", [
    (4, 128), (4, 64), (4, 32), (2, 128), (2, 64), (1, 128),
])
@pytest.mark.parametrize("M", [1, 8, 33])
def test_asymmetric_grouped(W_nbits, group_size, M):
    N, K = 256, 512
    rng = np.random.default_rng(0)
    W_q, scales, zeros, W_deq = gen_hqq_data(rng, N, K, W_nbits, group_size)

    for fma in (True, False):
        layer = GemLiteLinear(W_nbits, group_size, K, N,
                              DType.BF16, DType.BF16).pack(
            W_q, scales, zeros, fma_mode=fma)
        assert layer.W_group_mode == (4 if fma else 3)
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.2, jnp.bfloat16)
        got, want = _run_both(layer, x, M, N, K)
        ref = np.asarray(x, np.float32) @ W_deq.T
        err = np.mean(np.abs(np.asarray(got, np.float32) - ref))
        err_oracle = np.mean(np.abs(np.asarray(want, np.float32) - ref))
        scale = np.mean(np.abs(ref)) + 1e-6
        assert err / scale < 5e-3, (err / scale, err_oracle / scale)


@pytest.mark.parametrize("group_size", [64, 128])
def test_symmetric_grouped(group_size):
    """W_group_mode 2: scales only."""
    N, K = 256, 512
    rng = np.random.default_rng(1)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // group_size
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
    W_deq = (W_q.reshape(-1, group_size) * scales).reshape(N, K)

    layer = GemLiteLinear(4, group_size, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, None)
    assert layer.W_group_mode == 2
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.2, jnp.bfloat16)
    got, _ = _run_both(layer, x, 1, N, K)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(got, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel


def test_scalar_zero_shift_only():
    """W_group_mode 1 with scalar integer zero (BitNet-style storage)."""
    N, K = 256, 512
    rng = np.random.default_rng(2)
    W_q = rng.integers(0, 4, size=(N, K)).astype(np.uint8)

    layer = GemLiteLinear(2, None, K, N, DType.BF16, DType.BF16).pack(
        W_q, None, zeros=1)
    assert layer.W_group_mode == 1 and layer.zero_is_scalar
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.2, jnp.bfloat16)
    got, _ = _run_both(layer, x, 1, N, K)
    ref = np.asarray(x, np.float32) @ (W_q.astype(np.float32) - 1.0).T
    rel = np.mean(np.abs(np.asarray(got, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel


def test_channelwise_postscale():
    """channel_scale_mode 1: weight-only channel-wise post-scaling."""
    N, K = 256, 512
    rng = np.random.default_rng(3)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = (rng.uniform(0.5, 1.5, size=(N, 1)) * 2.0**-8).astype(np.float32)
    zeros = np.full((N, 1), 8.0, np.float32)
    W_deq = (W_q - zeros) * scales

    layer = GemLiteLinear(4, None, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros, fma_mode=False)
    assert layer.channel_scale_mode == 1 and layer.W_group_mode == 1
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.2, jnp.bfloat16)
    got, _ = _run_both(layer, x, 1, N, K)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(got, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel


def test_dispatch_routes_decode_kernel():
    """forward_functional at M=1 uses the decode kernel (same numerics)."""
    N, K = 256, 512
    rng = np.random.default_rng(4)
    W_q, scales, zeros, W_deq = gen_hqq_data(rng, N, K, 4, 64)
    layer = GemLiteLinear(4, 64, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.2, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel


def test_selected_config_satisfies_mosaic_folded_constraint():
    """TPU-only Mosaic rule (invisible to interpret mode): the folded x spec
    (bm, c, gs) needs c = bk//gs divisible by 8 or covering the whole G_eff
    axis. The selector must never emit a violating config (regression: A16W8
    gs=K M=1 crashed the real-TPU dispatch with block (1, 2, 512))."""
    import numpy as np
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.ops.pallas_decode import (_effective_gs,
                                               can_use_decode_kernel,
                                               select_decode_config)
    rng = np.random.default_rng(0)
    cases = [(8, None, 4096, 4096), (4, None, 4096, 4096),
             (2, None, 4096, 4096), (4, 128, 4096, 4096),
             (4, 64, 2048, 1024), (8, None, 8192, 8192),
             (4, None, 2048, 1024), (1, 128, 4096, 4096)]
    for W, gs, K, N in cases:
        gse = gs or K
        W_q = rng.integers(0, 2**W, size=(N, K)).astype(np.uint8)
        G = N * K // gse
        sc = (rng.uniform(0.5, 1.5, (G, 1)) * 2.0**-8).astype(np.float32)
        zr = rng.integers(0, 2**W, (G, 1)).astype(np.float32)
        layer = GemLiteLinear(W, gs, K, N, DType.BF16, DType.BF16).pack(
            W_q, sc, zr)
        cfg = select_decode_config(layer.meta, 1, N, K)
        if not can_use_decode_kernel(layer.meta, 1, N, K, cfg):
            continue  # falls to another kernel; nothing to check
        if layer.w_layout:
            g = _effective_gs(layer.meta, K, cfg.block_k)
            c = cfg.block_k // g
            assert c % 8 == 0 or c == K // g, (W, gs, K, N, cfg)
