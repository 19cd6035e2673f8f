# SPDX-License-Identifier: Apache-2.0
"""Prefill-regime dequant-cache kernel vs the jnp oracle (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu.ops.pallas_prefill import (
    pallas_prefill_matmul,
    can_use_prefill_kernel,
    select_prefill_config,
)
from tests.test_decode_kernel import gen_hqq_data


@pytest.mark.parametrize("W_nbits,group_size,M", [
    (4, 128, 96), (4, 128, 200), (2, 128, 130), (4, 256, 100),
])
def test_prefill_matches_reference(W_nbits, group_size, M):
    N, K = 256, 512
    rng = np.random.default_rng(0)
    W_q, scales, zeros, W_deq = gen_hqq_data(rng, N, K, W_nbits, group_size)

    for fma in (True, False):
        layer = GemLiteLinear(W_nbits, group_size, K, N,
                              DType.BF16, DType.BF16).pack(
            W_q, scales, zeros, fma_mode=fma)
        meta = layer.meta
        cfg = select_prefill_config(meta, M, N, K)
        assert can_use_prefill_kernel(meta, M, N, K, cfg), cfg
        got = pallas_prefill_matmul(x := jnp.asarray(
            rng.normal(size=(M, K)) * 0.2, jnp.bfloat16),
            layer.W_q, layer.scales, layer.zeros, None, meta, cfg,
            interpret=True)
        ref = np.asarray(x, np.float32) @ W_deq.T
        rel = np.mean(np.abs(np.asarray(got, np.float32) - ref)) / \
            (np.mean(np.abs(ref)) + 1e-6)
        assert rel < 5e-3, (fma, rel)


def test_dispatch_routes_prefill():
    N, K = 256, 512
    rng = np.random.default_rng(1)
    W_q, scales, zeros, W_deq = gen_hqq_data(rng, N, K, 4, 128)
    layer = GemLiteLinear(4, 128, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    x = jnp.asarray(rng.normal(size=(100, K)) * 0.2, jnp.bfloat16)
    y = layer(x)  # M=100 -> GEMM family -> prefill kernel
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel


def test_pallas_dequantize_matches_dequantize_full():
    """The one-pass Pallas dequantize (giant-M dense fallback) must match
    the fused-XLA dequantize_full to bf16 rounding across formats."""
    import numpy as np
    import jax.numpy as jnp
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.autograd import dequantize_full
    from gemlite_tpu.ops.pallas_prefill import (can_use_dequantize,
                                                pallas_dequantize)

    rng = np.random.default_rng(0)
    N, K = 256, 512
    for W_nbits, gs, fma in [(4, 128, True), (4, 64, False), (2, 64, True),
                             (8, 128, True)]:
        codes = rng.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
        G = N * K // gs
        scales = (rng.uniform(0.5, 1.5, (G, 1)) * 2**-8).astype(np.float32)
        zeros = rng.integers(0, 2**W_nbits, (G, 1)).astype(np.float32)
        layer = GemLiteLinear(W_nbits, gs, K, N, DType.BF16, DType.BF16).pack(
            codes, scales, zeros, fma_mode=fma)
        assert can_use_dequantize(layer.meta, N, K)
        b_pl = pallas_dequantize(layer.W_q, layer.scales, layer.zeros, layer.meta)
        b_ref = dequantize_full(layer.W_q, layer.scales, layer.zeros,
                                layer.meta, dtype=jnp.bfloat16)
        d = float(jnp.max(jnp.abs(b_pl.astype(jnp.float32)
                                  - b_ref.astype(jnp.float32))))
        m = float(jnp.mean(jnp.abs(b_ref.astype(jnp.float32)))) + 1e-9
        assert d / m < 2e-3, (W_nbits, gs, d / m)


def test_dispatch_giant_m_dense_fallback():
    """M >= 4096 routes through the dense fallback and stays correct."""
    import numpy as np
    import jax.numpy as jnp
    from gemlite_tpu import DType, GemLiteLinear

    rng = np.random.default_rng(1)
    N, K, gs = 256, 512, 128
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = np.full((G, 1), 2.0**-8, np.float32)
    zeros = rng.integers(0, 16, (G, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        codes, scales, zeros)
    W_deq = ((codes.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    x = jnp.asarray(rng.normal(size=(4096, K)) * 0.1, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x[:32], np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y[:32], np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-9)
    assert rel < 5e-3, rel


def test_giant_m_dense_fallback_reference_layout_correct():
    """Regression: w_layout=0 layers (e.g. INT8-activation) at M >= 4096 must
    NOT use pallas_dequantize (its row order is the plane slot order, natural
    only for folded layers) — the fallback must stay numerically correct."""
    import numpy as np
    import jax.numpy as jnp
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.ops.pallas_prefill import can_use_dequantize

    rng = np.random.default_rng(2)
    N, K, gs = 256, 512, 128
    codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = np.full((G, 1), 2.0**-8, np.float32)
    zeros = rng.integers(0, 16, (G, 1)).astype(np.int32).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.INT8, DType.BF16,
                          scaled_activations=True).pack(codes, scales, zeros,
                                                        fma_mode=False)
    assert layer.w_layout == 0
    assert not can_use_dequantize(layer.meta, N, K)
    W_deq = ((codes.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    x = jnp.asarray(rng.normal(size=(4096, K)) * 0.2, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x[:16], np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y[:16], np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-9)
    assert rel < 2e-2, rel
