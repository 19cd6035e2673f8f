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
        assert rel < 2e-2, (fma, rel)


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
    assert rel < 2e-2, rel
