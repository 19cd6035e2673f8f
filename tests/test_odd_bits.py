# SPDX-License-Identifier: Apache-2.0
"""Experimental W3/W5 dual-plane packing (reference A16W3_gemm/A16W5_gemm)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gemlite_tpu.experimental import A16W3, A16W5
from gemlite_tpu.experimental.odd_bits import OddBitLinear


def _mk(nbits, N, K, gs, seed=0):
    rng = np.random.default_rng(seed)
    W_q = rng.integers(0, 2**nbits, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2**-6).astype(np.float32)
    zeros = rng.integers(0, 2**nbits, size=(G, 1)).astype(np.float32)
    W_deq = ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    return W_q, scales, zeros, W_deq


@pytest.mark.parametrize("proc,nbits", [(A16W3, 3), (A16W5, 5)])
def test_odd_bit_linear_fallback(proc, nbits):
    # gs=64 with W3 (hi 2-bit: t_rows = 8 OK) still fuses; use a non-128
    # aligned N to exercise the XLA fallback
    rng = np.random.default_rng(0)
    N, K, gs = 96, 256, 64
    W_q, scales, zeros, W_deq = _mk(nbits, N, K, gs)
    layer = proc(group_size=gs).from_weights(W_q, scales, zeros)
    assert not layer.fused
    x = jnp.asarray(rng.normal(size=(4, K)) * 0.3, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert y.shape == (4, N)
    assert rel < 1e-2, rel


@pytest.mark.parametrize("proc,nbits", [(A16W3, 3), (A16W5, 5)])
@pytest.mark.parametrize("M", [1, 8, 100])
@pytest.mark.parametrize("gs", [64, 128])
def test_odd_bit_fused_kernels(proc, nbits, M, gs):
    """The fused dual-plane Pallas path must match the dense reference in
    both regimes (decode M<=64, prefill M>64)."""
    rng = np.random.default_rng(1)
    N, K = 256, 512
    W_q, scales, zeros, W_deq = _mk(nbits, N, K, gs, seed=1)
    layer = proc(group_size=gs).from_weights(W_q, scales, zeros)
    assert layer.fused, "expected the fused plane path for aligned shapes"
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.3, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 5e-3, rel
    # fused and fallback paths agree
    y_xla = layer._forward_xla(x.reshape(-1, K))
    rel2 = np.mean(np.abs(np.asarray(y, np.float32) -
                          np.asarray(y_xla, np.float32))) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel2 < 5e-3, rel2


def test_odd_bit_bias_and_1d():
    rng = np.random.default_rng(2)
    N, K, gs = 128, 256, 64
    W_q, scales, zeros, W_deq = _mk(3, N, K, gs, seed=2)
    bias = rng.normal(size=(N,)).astype(np.float32)
    layer = OddBitLinear(3, gs, K, N).pack(W_q, scales, zeros, bias=bias)
    x = jnp.asarray(rng.normal(size=(K,)) * 0.3, jnp.bfloat16)
    y = layer(x)
    assert y.shape == (N,)
    ref = np.asarray(x, np.float32) @ W_deq.T + bias
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert rel < 1e-2, rel
