# SPDX-License-Identifier: Apache-2.0
"""Experimental prefill KernelConfig knobs: bf16 cache build + sub-column
build/dot interleave (config.py KernelConfig.build_bf16 / n_sub).

Both must preserve numerics: n_sub only reorders lane columns of the same
arithmetic; build_bf16 adds at most one bf16 rounding on the group-scale
multiply (the cache is bf16 either way)."""

import numpy as np
import pytest
import jax.numpy as jnp

from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu.config import KernelConfig
from gemlite_tpu.ops.pallas_prefill import (
    pallas_prefill_matmul, can_use_prefill_kernel, select_prefill_config)
from tests.test_decode_kernel import gen_hqq_data


def _run(layer, x, M, N, K, **kw):
    base = select_prefill_config(layer.meta, M, N, K)
    cfg = KernelConfig(block_m=base.block_m, block_n=base.block_n,
                       block_k=base.block_k, **kw)
    assert can_use_prefill_kernel(layer.meta, M, N, K, cfg), cfg
    return pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                 None, layer.meta, cfg, interpret=True)


@pytest.mark.parametrize("fma", [True, False])
@pytest.mark.parametrize("knobs", [
    {"build_bf16": True},
    {"n_sub": 2},
    {"build_bf16": True, "n_sub": 2},
])
def test_knobs_match_reference(fma, knobs):
    N, K, M = 256, 512, 96
    rng = np.random.default_rng(0)
    W_q, scales, zeros, W_deq = gen_hqq_data(rng, N, K, 4, 128)
    layer = GemLiteLinear(4, 128, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros, fma_mode=fma)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.2, jnp.bfloat16)
    got = _run(layer, x, M, N, K, **knobs)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = np.mean(np.abs(np.asarray(got, np.float32) - ref)) / \
        (np.mean(np.abs(ref)) + 1e-6)
    # one extra bf16 rounding at most on top of the 2.3e-3 bf16-x floor
    assert rel < 6e-3, (knobs, rel)
    if not knobs.get("build_bf16"):
        # n_sub alone reorders identical arithmetic: bit-equal output
        base = _run(layer, x, M, N, K)
        assert bool(jnp.all(got == base)), knobs


def test_n_sub_sanitized_for_unsupported_paths():
    """NVFP4 (pair-fused build) must silently fall back to n_sub=1."""
    from gemlite_tpu.mx import (mxfp_quantize_layer_for_autotune,
                                mx_dequantize_weight_ref)
    rng = np.random.default_rng(1)
    layer = mxfp_quantize_layer_for_autotune(256, 512, DType.NVFP4, rng)
    M = 96
    x = jnp.asarray(rng.normal(size=(M, 512)) * 0.3, jnp.bfloat16)
    Wd = np.asarray(mx_dequantize_weight_ref(layer.W_q, layer.scales,
                                             layer.meta), np.float32)
    y_ref = np.asarray(x, np.float32) @ Wd
    base = select_prefill_config(layer.meta, M, 256, 512)
    cfg = KernelConfig(block_m=base.block_m, block_n=base.block_n,
                       block_k=base.block_k, n_sub=2, build_bf16=True)
    from gemlite_tpu.quant import scale_activations_per_token  # noqa: F401
    from gemlite_tpu.mx import fake_quant_activations
    xf = fake_quant_activations(x, DType(layer.input_dtype))
    got = pallas_prefill_matmul(
        xf.astype(jnp.bfloat16), layer.W_q, layer.scales, layer.zeros, None,
        layer.meta._replace(channel_scale_mode=0), cfg, interpret=True)
    rel = np.mean(np.abs(np.asarray(got, np.float32) - y_ref)) / \
        (np.mean(np.abs(y_ref)) + 1e-6)
    assert rel < 0.15, rel  # nvfp4 quantization error dominates


def test_config_json_roundtrip_with_knobs():
    c = KernelConfig(256, 512, 4096, build_bf16=True, n_sub=4)
    d = c.to_dict()
    assert d["build_bf16"] and d["n_sub"] == 4
    assert KernelConfig.from_dict(d) == c
    # defaults are dropped from the serialized form (shipped-table compat)
    c0 = KernelConfig(256, 512, 4096)
    d0 = c0.to_dict()
    assert "build_bf16" not in d0 and "n_sub" not in d0
    assert KernelConfig.from_dict(d0) == c0
