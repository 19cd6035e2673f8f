"""MXFP / NVFP4 end-to-end processor tests (ported from the reference
tests/test_mxfp.py strategy): packed byte-count assertions + numerics vs the
float layer, plus pallas-vs-oracle equivalence for the MX kernel path."""

import numpy as np
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.mx import (
    A16W8_MXFP, A16W4_MXFP,
    A8W8_MXFP_dynamic, A8W4_MXFP_dynamic,
    A4W4_MXFP_dynamic, A4W4_NVFP_dynamic,
    mxfp_quantize_weight, pack_mxfp_layer, mx_forward_ref, fake_quant_activations,
)
from gemlite_tpu.dtypes import DType
from gemlite_tpu.quant import WeightQuantizerMXFP, fp4_dequant

RNG = np.random.default_rng(11)
IN_FEATURES, OUT_FEATURES = 512, 256
BATCH_SIZES = [1, 4, 16]
MATMUL_TYPES = ["GEMM_SPLITK", "GEMM"]

W = (RNG.normal(size=(OUT_FEATURES, IN_FEATURES)) * 0.1).astype(np.float32)


class FloatLinear:
    weight = W
    bias = None


def _x(m):
    return jnp.asarray(RNG.normal(size=(m, IN_FEATURES)) * 0.1, jnp.bfloat16)


def _rel(y, y_ref):
    y = jnp.asarray(y, jnp.float32); y_ref = jnp.asarray(y_ref, jnp.float32)
    return float(jnp.mean(jnp.abs(y - y_ref)) / (jnp.mean(jnp.abs(y_ref)) + 1e-9))


def _eval(layer, tol):
    for m in BATCH_SIZES:
        x = _x(m)
        y_ref = x.astype(jnp.float32) @ W.T
        for mt in MATMUL_TYPES:
            y = layer.forward_manual(x, matmul_type=mt)
            assert y.shape == (m, OUT_FEATURES)
            r = _rel(y, y_ref)
            assert r < tol, f"{mt} M={m}: rel err {r} >= {tol}"


def _packed_bytes(layer):
    return layer.W_q.size * layer.W_q.dtype.itemsize


def test_weight_quantizer_roundtrip():
    q = WeightQuantizerMXFP(compute_dtype=jnp.float32)
    W_q, scales = q.quantize_mxfp4(W, index=True)
    assert scales.dtype == jnp.uint8  # e8m0 stored as exponent bits
    W_r = q.dequantize(W_q, scales, shape=W.shape)
    assert _rel(W_r, W) < 0.12  # fp4 is lossy but bounded


def test_mxfp4_window_search_improves():
    from gemlite_tpu.quant import e8m0_bits_to_f32
    q = WeightQuantizerMXFP(compute_dtype=jnp.float32)
    W_q0, s0 = q.quantize_mxfp4(W, window_size=0, index=True)
    W_q2, s2 = q.quantize_mxfp4(W, window_size=2, index=True)
    def err(W_q, s):
        s = e8m0_bits_to_f32(s)
        return float(np.mean(np.abs(
            np.asarray(fp4_dequant(W_q).reshape(-1, 32) * s.reshape(-1, 1)).reshape(W.shape) - W)))
    assert err(W_q2, s2) <= err(W_q0, s0) + 1e-9


def test_a16w8_mxfp():
    layer = A16W8_MXFP(dtype=jnp.bfloat16).from_linear(FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES  # fp8: 1 byte/elem
    assert not layer.scaled_activations
    assert layer.W_group_mode == 2 and layer.channel_scale_mode == 0
    _eval(layer, tol=5e-2)


def test_a16w4_mxfp():
    layer = A16W4_MXFP(dtype=jnp.bfloat16).from_linear(FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES // 2  # fp4: nibble
    assert not layer.scaled_activations
    _eval(layer, tol=1.6e-1)


def test_a8w8_mxfp_dynamic_microscaled():
    layer = A8W8_MXFP_dynamic(dtype=jnp.bfloat16, post_scale=False).from_linear(
        FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES
    assert layer.scaled_activations and layer.channel_scale_mode == 4
    _eval(layer, tol=6e-2)


def test_a8w8_mxfp_dynamic_post_scale():
    layer = A8W8_MXFP_dynamic(dtype=jnp.bfloat16, post_scale=True).from_linear(
        FloatLinear(), del_orig=False)
    assert layer.channel_scale_mode == 2
    _eval(layer, tol=6e-2)


def test_a8w4_mxfp_dynamic():
    layer = A8W4_MXFP_dynamic(dtype=jnp.bfloat16, post_scale=False).from_linear(
        FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES // 2
    assert layer.scaled_activations
    _eval(layer, tol=1.6e-1)


def test_a4w4_mxfp_dynamic():
    layer = A4W4_MXFP_dynamic(dtype=jnp.bfloat16).from_linear(FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES // 2
    assert layer.scaled_activations and layer.input_dtype == DType.MXFP4
    _eval(layer, tol=2e-1)


def test_a4w4_nvfp_dynamic():
    layer = A4W4_NVFP_dynamic(dtype=jnp.bfloat16).from_linear(FloatLinear(), del_orig=False)
    assert _packed_bytes(layer) == IN_FEATURES * OUT_FEATURES // 2
    assert layer.input_dtype == DType.NVFP4 and layer.group_size == 16
    _eval(layer, tol=2e-1)


def test_mx_pallas_matches_oracle():
    """The Pallas MX kernel must agree with the jnp MX oracle tightly."""
    from gemlite_tpu.ops.pallas_gemm import pallas_fused_matmul, select_default_config, can_use_pallas
    # the general kernel unpacks the reference LSB-first layout, so unfold
    # the (now default) plane-folded packing first
    layer = A16W4_MXFP(dtype=jnp.bfloat16).from_linear(
        FloatLinear(), del_orig=False).to_reference_layout()
    meta = layer.meta
    M, K, N = 4, IN_FEATURES, OUT_FEATURES
    x = _x(M)
    y_ref = mx_forward_ref(x, layer.W_q, layer.scales, None, None, meta)
    cfg = select_default_config(meta, M, N, K)
    assert can_use_pallas(meta, M, N, K, cfg), cfg
    y_pl = pallas_fused_matmul(x, layer.W_q, layer.scales, None, None, meta, cfg)
    assert _rel(y_pl, y_ref) < 2e-3


def test_fake_quant_activations_close():
    x = _x(8).astype(jnp.float32)
    # per-element fake-quant error = inherent fp8 (~2.3%) / fp4 (~12%) noise
    for d, tol in [(DType.MXFP8, 3e-2), (DType.MXFP4, 1.5e-1), (DType.NVFP4, 1.2e-1)]:
        xq = fake_quant_activations(x, d, jnp.float32)
        assert _rel(xq, x) < tol, d


def test_nvfp4_window_search_improves():
    """The NVFP4 window search must score candidates against the TRUE
    reconstruction q * (scale * META_SCALE) — the old metric (q * scale)
    degenerated to always picking the smallest candidate (6x worse MAE)."""
    from gemlite_tpu.quant import NVFP4_META_SCALE

    q = WeightQuantizerMXFP(compute_dtype=jnp.float32)
    W_q0, s0 = q.quantize_nvfp4(W, window_size=0, index=True)
    W_q2, s2 = q.quantize_nvfp4(W, window_size=2, index=True)

    def err(W_q, s):
        sf = np.asarray(s, np.float32) * NVFP4_META_SCALE
        rec = np.asarray(fp4_dequant(W_q), np.float32).reshape(-1, 16) \
            * sf.reshape(-1, 1)
        return float(np.mean(np.abs(rec.reshape(W.shape) - W)))

    e0, e2 = err(W_q0, s0), err(W_q2, s2)
    assert e2 <= e0 + 1e-9, (e0, e2)
    # the search must also not degenerate (old bug: ~6x worse than window=0)
    assert e2 < 1.5 * e0, (e0, e2)
    assert not np.any(np.isnan(np.asarray(s2, np.float32)))


@pytest.mark.slow
def test_warmup_every_processor_family():
    """warmup() must build + run a layer for every processor constructor
    surface: self-quantizing (A16W8), pre-quantized INT Wn, MXFP/NVFP
    (previously TypeError), and BitNet (previously float(None) crash)."""
    from gemlite_tpu.helper import (A16W4_HQQ_INT, A16W8_INT8, A16W158_INT,
                                    warmup)

    shapes = [(128, 256)]
    for proc in (A16W8_INT8(), A16W4_HQQ_INT(), A16W158_INT(),
                 A16W4_MXFP(dtype=jnp.bfloat16),
                 A4W4_NVFP_dynamic(dtype=jnp.bfloat16)):
        layers = warmup(proc, shapes, batch_sizes=[1, 4], group_size=64)
        assert len(layers) == 1 and layers[0] is not None
