"""Processor (helper) tests: mode-override invariants + end-to-end numerics,
mirroring the reference's processor test strategy."""

import numpy as np
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.core import GemLiteLinear
from gemlite_tpu.dtypes import DType
from gemlite_tpu.helper import (
    A16W8_INT8, A16W8_FP8, A16W4_HQQ_INT, A16W2_HQQ_INT,
    A8W8_INT8_dynamic, A8W8_FP8_dynamic, A8W4_HQQ_INT_dynamic,
    A16W158_INT, A8W158_INT_dynamic, patch_model,
)
from gemlite_tpu.quant import scale_activations_per_token

RNG = np.random.default_rng(3)
N, K, GS = 128, 256, 64


def _w():
    return (RNG.normal(size=(N, K)) * 0.05).astype(np.float32)


def _x(m, dtype=jnp.bfloat16):
    return jnp.asarray(RNG.normal(size=(m, K)) * 0.1, dtype)


def _rel(a, b):
    a = jnp.asarray(a, jnp.float32); b = jnp.asarray(b, jnp.float32)
    return float(jnp.mean(jnp.abs(a - b)) / (jnp.mean(jnp.abs(b)) + 1e-9))


def _hqq_quant(w, nbits, gs):
    wg = w.reshape(-1, gs)
    mn, mx = wg.min(axis=1, keepdims=True), wg.max(axis=1, keepdims=True)
    scales = np.maximum((mx - mn) / (2**nbits - 1), 1e-8).astype(np.float32)
    zeros = (-mn / scales).astype(np.float32)
    W_q = np.clip(np.round(wg / scales + zeros), 0, 2**nbits - 1).astype(np.uint8)
    W_deq = ((W_q - zeros) * scales).reshape(w.shape)
    return W_q.reshape(w.shape), scales, zeros, W_deq


def test_a16w8_int8():
    w = _w()
    layer = A16W8_INT8().from_weights(w)
    assert (layer.W_group_mode, layer.channel_scale_mode) == (2, 0)
    x = _x(4)
    # dequantized ground truth
    s = np.abs(w).max(axis=1, keepdims=True) / 127.0
    W_deq = np.round(w / np.maximum(s, 1e-6)).clip(-128, 127) * s
    assert _rel(layer(x), x.astype(jnp.float32) @ W_deq.T) < 5e-3


def test_a16w8_int8_post_scale():
    w = _w()
    layer = A16W8_INT8(post_scale=True).from_weights(w)
    assert (layer.W_group_mode, layer.channel_scale_mode) == (0, 1)
    x = _x(4)
    y_pre = A16W8_INT8().from_weights(w)(x)
    assert _rel(layer(x), y_pre) < 5e-3


def test_a16w8_fp8():
    w = _w()
    layer = A16W8_FP8().from_weights(w)
    assert layer.W_nbits == 8 and layer.input_dtype in (DType.BF16, DType.FP16, DType.FP32)
    x = _x(4)
    assert _rel(layer(x), x.astype(jnp.float32) @ w.T) < 8e-2  # fp8 weight quant error


@pytest.mark.parametrize("proc_cls,nbits", [(A16W4_HQQ_INT, 4), (A16W2_HQQ_INT, 2)])
def test_a16wn_hqq(proc_cls, nbits):
    w = _w()
    W_q, scales, zeros, W_deq = _hqq_quant(w, nbits, GS)
    layer = proc_cls().from_weights(W_q, scales, zeros)
    assert layer.W_nbits == nbits and layer.group_size == GS
    assert layer.W_group_mode in (3, 4) and layer.channel_scale_mode == 0
    x = _x(4)
    assert _rel(layer(x), x.astype(jnp.float32) @ W_deq.T) < 5e-3


def test_a8w8_int8_dynamic():
    w = _w()
    layer = A8W8_INT8_dynamic().from_weights(w)
    assert (layer.W_group_mode, layer.channel_scale_mode) == (0, 3)
    assert layer.input_dtype == DType.INT8 and layer.scaled_activations
    x = _x(4, jnp.float32)
    s = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-6)
    W_q = np.round(w / s).clip(-128, 127)
    xq, sx = scale_activations_per_token(x, jnp.int8)
    y_ref = (xq.astype(jnp.float32) @ (W_q * s).T) * sx
    assert _rel(layer(x), y_ref) < 1e-2


def test_a8w8_fp8_dynamic():
    w = _w()
    layer = A8W8_FP8_dynamic().from_weights(w)
    assert (layer.W_group_mode, layer.channel_scale_mode) == (0, 3)
    assert layer.input_dtype == DType.FP8
    x = _x(4, jnp.float32)
    assert _rel(layer(x), x @ w.T) < 8e-2


def test_a8w4_hqq_dynamic():
    w = _w()
    W_q, scales, zeros, W_deq = _hqq_quant(w, 4, GS)
    layer = A8W4_HQQ_INT_dynamic().from_weights(W_q, scales, zeros)
    assert layer.input_dtype == DType.FP8 and layer.scaled_activations
    assert layer.W_group_mode == 3 and layer.channel_scale_mode == 2  # grouped
    x = _x(4, jnp.float32)
    xq, sx = scale_activations_per_token(x, jnp.float8_e4m3fn)
    y_ref = (xq.astype(jnp.float32) @ W_deq.T) * sx
    assert _rel(layer(x), y_ref) < 3e-2


def test_bitnet_a16w158():
    w = RNG.integers(-1, 2, size=(N, K)).astype(np.float32)
    ws = np.float32(0.025)
    layer = A16W158_INT().from_weights(w, ws)
    assert layer.W_nbits == 2
    assert (layer.W_group_mode, layer.channel_scale_mode) == (1, 1)
    x = _x(4)
    assert _rel(layer(x), x.astype(jnp.float32) @ (w * ws).T) < 5e-3


def test_bitnet_a8w158_dynamic():
    w = RNG.integers(-1, 2, size=(N, K)).astype(np.float32)
    ws = np.float32(0.025)
    layer = A8W158_INT_dynamic().from_weights(w, ws)
    assert (layer.W_group_mode, layer.channel_scale_mode) == (1, 3)
    assert layer.input_dtype == DType.INT8 and layer.scaled_activations
    x = _x(4, jnp.float32)
    xq, sx = scale_activations_per_token(x, jnp.int8)
    y_ref = (xq.astype(jnp.float32) @ (w * ws).T) * sx
    assert _rel(layer(x), y_ref) < 1e-2


def test_patch_model_torch():
    torch = pytest.importorskip("torch")

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.up = torch.nn.Linear(K, N, bias=False)
            self.down = torch.nn.Linear(K, N, bias=True)
            self.lm_head = torch.nn.Linear(K, N, bias=False)

    model = Tiny().float()
    patch_model(model, A16W8_INT8())
    assert isinstance(model.up, GemLiteLinear)
    assert isinstance(model.down, GemLiteLinear)
    assert isinstance(model.lm_head, torch.nn.Linear)  # skipped
    y = model.up(_x(2))
    assert y.shape == (2, N)


def test_patch_model_generic_tree():
    class PyLinear:
        def __init__(self):
            self.weight = _w()
            self.bias = None

        def __call__(self, x):
            return x @ self.weight.T

    class Block:
        def __init__(self):
            self.proj = PyLinear()

    class Model:
        def __init__(self):
            self.blocks = [Block(), Block()]

    m = Model()
    patch_model(m, A16W8_INT8())
    assert isinstance(m.blocks[0].proj, GemLiteLinear)
    assert isinstance(m.blocks[1].proj, GemLiteLinear)


def test_native_int_quantizer_beats_minmax():
    """quant.quantize_int_weights (the native HQQ-style alternating
    refinement; reference delegates to the external hqq package) must never
    be worse than min-max and must integrate with A16Wn_HQQ_INT."""
    import numpy as np
    import jax.numpy as jnp
    from gemlite_tpu.quant import quantize_int_weights
    from gemlite_tpu.helper import A16W4_HQQ_INT

    rng = np.random.default_rng(11)
    W = rng.normal(size=(256, 512)).astype(np.float32) * 0.02
    W[rng.integers(0, 256, 16), rng.integers(0, 512, 16)] *= 8  # outliers

    for nb in (2, 4, 8):
        Wq, s, z = quantize_int_weights(W, nb, 128, iters=10)
        rec = ((np.asarray(Wq).reshape(-1, 128) - z) * s).reshape(W.shape)
        Wq0, s0, z0 = quantize_int_weights(W, nb, 128, optimize=False)
        rec0 = ((np.asarray(Wq0).reshape(-1, 128) - z0) * s0).reshape(W.shape)
        mse_opt = float(((W - rec) ** 2).mean())
        mse_mm = float(((W - rec0) ** 2).mean())
        assert mse_opt <= mse_mm * 1.0001, (nb, mse_opt, mse_mm)
        assert np.asarray(Wq).dtype == np.uint8
        assert (np.asarray(Wq) <= 2 ** nb - 1).all()

    lay = A16W4_HQQ_INT(dtype=jnp.bfloat16).from_float_weights(W)
    x = jnp.asarray(rng.normal(size=(2, 512)) * 0.1, jnp.bfloat16)
    y = lay(x)
    ref = np.asarray(x, np.float32) @ W.T
    rel = float(np.abs(np.asarray(y, np.float32) - ref).mean()
                / (np.abs(ref).mean() + 1e-12))
    assert rel < 0.15, rel
