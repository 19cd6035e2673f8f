# SPDX-License-Identifier: Apache-2.0
"""Experimental W3/W5 dual-plane packing (reference A16W3_gemm/A16W5_gemm)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gemlite_tpu.experimental import A16W3, A16W5


@pytest.mark.parametrize("proc,nbits", [(A16W3, 3), (A16W5, 5)])
def test_odd_bit_linear(proc, nbits):
    rng = np.random.default_rng(0)
    N, K, gs = 128, 256, 64
    W_q = rng.integers(0, 2**nbits, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2**-6).astype(np.float32)
    zeros = rng.integers(0, 2**nbits, size=(G, 1)).astype(np.float32)
    W_deq = ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K)

    layer = proc(group_size=gs).from_weights(W_q, scales, zeros)
    x = jnp.asarray(rng.normal(size=(4, K)) * 0.3, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    assert y.shape == (4, N)
    assert rel < 1e-2, rel
