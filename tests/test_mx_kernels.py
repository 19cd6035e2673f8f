# SPDX-License-Identifier: Apache-2.0
"""MX fast-path kernels vs the MX oracle (interpret mode).

The fp4 / fp8-e4m3 bit-remap plane kernels must agree with the jnp MX oracle
(mx.py) bit-for-bit on normal values (fp8 subnormals flush to zero by design;
the quantizers never emit them for sane inputs)."""

import types

import numpy as np
import pytest
import jax.numpy as jnp

from gemlite_tpu.mx import (
    A16W4_MXFP, A16W8_MXFP, A8W8_MXFP_dynamic, mx_forward_ref,
)
from gemlite_tpu.ops.pallas_decode import (
    can_use_decode_kernel, select_decode_config, pallas_decode_matmul,
)
from gemlite_tpu.ops.pallas_prefill import (
    can_use_prefill_kernel, select_prefill_config, pallas_prefill_matmul,
)


def _layer(proc, N=256, K=512, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.normal(size=(N, K)) * 0.02).astype(np.float32)
    o = types.SimpleNamespace()
    o.weight = w
    o.bias = None
    return proc.from_linear(o, del_orig=False), w


@pytest.mark.parametrize("proc_cls", [A16W4_MXFP, A16W8_MXFP])
@pytest.mark.parametrize("M", [1, 8])
def test_decode_kernel_matches_mx_oracle(proc_cls, M):
    N, K = 256, 512
    layer, w = _layer(proc_cls())
    meta = layer.meta
    cfg = select_decode_config(meta, M, N, K)
    assert can_use_decode_kernel(meta, M, N, K, cfg), (proc_cls.__name__, cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
    got = pallas_decode_matmul(x, layer.W_q, layer.scales, layer.zeros, None,
                               meta, cfg, interpret=True)
    want = mx_forward_ref(x, layer.W_q, layer.scales, None, None, meta)
    d = float(jnp.mean(jnp.abs(got.astype(jnp.float32) -
                               want.astype(jnp.float32))))
    s = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert d / s < 1e-3, d / s


@pytest.mark.parametrize("proc_cls", [A16W4_MXFP, A16W8_MXFP])
def test_prefill_kernel_matches_mx_oracle(proc_cls):
    N, K, M = 256, 512, 100
    layer, w = _layer(proc_cls())
    meta = layer.meta
    cfg = select_prefill_config(meta, M, N, K)
    assert can_use_prefill_kernel(meta, M, N, K, cfg), (proc_cls.__name__, cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
    got = pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros, None,
                                meta, cfg, interpret=True)
    want = mx_forward_ref(x, layer.W_q, layer.scales, None, None, meta)
    d = float(jnp.mean(jnp.abs(got.astype(jnp.float32) -
                               want.astype(jnp.float32))))
    s = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert d / s < 1e-3, d / s


def test_dynamic_mxfp8_end_to_end():
    """A8W8_MXFP_dynamic routes post-scale fp8 activations through the fast
    path with acceptable end-to-end error vs the dense weights."""
    N, K = 256, 512
    layer, w = _layer(A8W8_MXFP_dynamic())
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, K)) * 0.5, jnp.bfloat16)
    y = layer(x)
    ref = np.asarray(x, np.float32) @ w.T
    rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-9)
    assert rel < 8e-2, rel
