"""In-kernel micro-scaled activations (channel_scale_mode 4).

The prefill regime streams 1-byte fp8 activation codes + f32 group scales
into the kernel (reference gemm_kernels.py:519-524 streams tl.dot_scaled
operands); every other regime falls back to exact bf16 fake-quant. These
tests pin:

* the activation-value bit-exactness contract of
  quant.scale_activations_mx_transposed vs mx.fake_quant_activations,
* kernel-path equivalence (in-kernel csm-4 vs the fake-quant kernel run),
* that the prefill regime actually takes the fp8 path (bytes halved), and
* end-to-end layer forward vs the f32 oracle at prefill batch sizes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu import mx
from gemlite_tpu.dtypes import DType
from gemlite_tpu.mx import fake_quant_activations, mx_forward_ref
from gemlite_tpu.quant import scale_activations_mx_transposed
from gemlite_tpu.ops.pallas_prefill import (
    pallas_prefill_matmul,
    select_prefill_config,
    can_use_prefill_kernel,
)

RNG = np.random.default_rng(7)
K, N = 512, 256
W = (RNG.normal(size=(N, K)) * 0.05).astype(np.float32)


class _Lin:
    weight = jnp.asarray(W, jnp.float32)
    bias = None


MX_DTYPES = [DType.MXFP8, DType.MXFP4, DType.NVFP4]


def _layer(dt):
    if dt == DType.MXFP8:
        return mx.A8W8_MXFP_dynamic(post_scale=False).from_linear(_Lin(), del_orig=False)
    if dt == DType.MXFP4:
        return mx.A4W4_MXFP_dynamic().from_linear(_Lin(), del_orig=False)
    return mx.A4W4_NVFP_dynamic().from_linear(_Lin(), del_orig=False)


@pytest.mark.parametrize("dt", MX_DTYPES)
def test_transposed_quantizer_bit_exact_vs_fake_quant(dt):
    x = jnp.asarray(RNG.normal(size=(64, K)) * 3.0, jnp.bfloat16)
    ags = 16 if dt == DType.NVFP4 else 32
    cT, sT = scale_activations_mx_transposed(x, dt)
    assert cT.dtype == jnp.float8_e4m3fn and cT.shape == (K, 64)
    assert sT.dtype == jnp.float32 and sT.shape == (K // ags, 64)
    vals = (cT.astype(jnp.float32).T.reshape(64, K // ags, ags)
            * sT.T[:, :, None]).astype(jnp.bfloat16).reshape(64, K)
    fq = fake_quant_activations(x, dt)
    assert bool(jnp.all(vals == fq))


@pytest.mark.parametrize("dt", MX_DTYPES)
def test_inkernel_matches_fake_quant_kernel(dt):
    M = 128
    layer = _layer(dt)
    meta = layer.meta
    assert meta.channel_scale_mode == 4
    x = jnp.asarray(RNG.normal(size=(M, K)) * 2.0, jnp.bfloat16)
    cfg = select_prefill_config(meta, M, N, K)
    assert can_use_prefill_kernel(meta, M, N, K, cfg, mx_x=True)
    x_mx = scale_activations_mx_transposed(x, dt)
    y_new = pallas_prefill_matmul(None, layer.W_q, layer.scales, layer.zeros,
                                  None, meta, cfg, x_mx=x_mx)
    xf = fake_quant_activations(x, dt)
    y_old = pallas_prefill_matmul(xf, layer.W_q, layer.scales, layer.zeros,
                                  None, meta._replace(channel_scale_mode=0), cfg)
    d = jnp.max(jnp.abs(y_new.astype(jnp.float32) - y_old.astype(jnp.float32)))
    ref = jnp.max(jnp.abs(y_old.astype(jnp.float32)))
    # identical activation values; only the dot's accumulation order differs
    assert float(d) / (float(ref) + 1e-9) < 2e-3


@pytest.mark.parametrize("dt", MX_DTYPES)
def test_layer_forward_prefill_vs_oracle(dt):
    layer = _layer(dt)
    for M in (128, 256):
        x = jnp.asarray(RNG.normal(size=(M, K)) * 2.0, jnp.bfloat16)
        y = layer(x)
        xf = fake_quant_activations(x, DType(layer.input_dtype))
        y_ref = mx_forward_ref(xf.astype(jnp.float32), layer.W_q, layer.scales,
                               layer.zeros, None,
                               layer.meta._replace(channel_scale_mode=0))
        r = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32)))
                  / (jnp.mean(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9))
        assert r < 5e-3, f"{dt} M={M}: rel {r}"


@pytest.mark.parametrize("dt", MX_DTYPES)
def test_decode_regime_still_fake_quants(dt):
    """M <= 64 keeps the fake-quant fallback (decode kernels); forward must
    stay numerically consistent across the regime switch."""
    layer = _layer(dt)
    x1 = jnp.asarray(RNG.normal(size=(4, K)) * 2.0, jnp.bfloat16)
    y = layer(x1)
    xf = fake_quant_activations(x1, DType(layer.input_dtype))
    y_ref = mx_forward_ref(xf.astype(jnp.float32), layer.W_q, layer.scales,
                           layer.zeros, None,
                           layer.meta._replace(channel_scale_mode=0))
    r = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32)))
              / (jnp.mean(jnp.abs(y_ref.astype(jnp.float32))) + 1e-9))
    assert r < 5e-3
