"""Dispatch-coverage pins: every BENCH_MATRIX config must land on the kernel
it was benchmarked on. A dispatch regression (e.g. a gate knocking packed-W8
decode back to a slower path, as fixed in 6858cdf) then fails loudly here
instead of silently showing up as a perf cliff in the next benchmark session.

Uses the trace-time kernel log in ops/dispatch.py (the kernel that ACTUALLY
served the call), not a predictive mirror."""

import numpy as np
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu import DType, GemLiteLinear
from gemlite_tpu.core import forward_functional
import gemlite_tpu.ops.dispatch as dispatch

RNG = np.random.default_rng(3)
N, K = 1024, 2048


def _pack_int(W_nbits, gs, scaled_acts=False):
    gs_eff = gs if gs else K
    W_q = RNG.integers(0, 2 ** W_nbits, size=(N, K)).astype(np.uint8)
    G = N * K // gs_eff
    scales = (2.0 ** RNG.integers(-10, -6, (G, 1))).astype(np.float32)
    zeros = RNG.integers(0, 2 ** W_nbits, (G, 1)).astype(np.float32)
    lay = GemLiteLinear(W_nbits, gs_eff, K, N,
                        DType.INT8 if scaled_acts else DType.BF16, DType.BF16,
                        scaled_activations=scaled_acts)
    return lay.pack(W_q, scales, zeros)


def _served(layer, M):
    x = jnp.asarray(RNG.normal(size=(M, layer.in_features)) * 0.1,
                    jnp.bfloat16)
    dispatch.KERNEL_TRACE.clear()
    y = forward_functional(x, None, layer.get_tensor_args(), layer.meta)
    assert y.shape == (M, layer.out_features)
    return dispatch.last_kernel()


# (builder, M, expected kernel) — one row per BENCH_MATRIX config class.
def _fp8_dyn(**kw):
    from gemlite_tpu.helper import A8W8_FP8_dynamic
    W = (RNG.normal(size=(N, K)) * 0.02).astype(np.float32)
    return A8W8_FP8_dynamic(dtype=jnp.bfloat16, **kw).from_weights(W)


def _int8_dyn():
    from gemlite_tpu.helper import A8W8_INT8_dynamic
    W = (RNG.normal(size=(N, K)) * 0.02).astype(np.float32)
    return A8W8_INT8_dynamic(dtype=jnp.bfloat16).from_weights(W)


def _bitnet():
    from gemlite_tpu.helper import A16W158_INT
    w = RNG.integers(-1, 2, size=(N, K)).astype(np.float32)
    return A16W158_INT(dtype=jnp.bfloat16).from_weights(w, 0.02)


def _mxfp4():
    from gemlite_tpu.mx import A16W4_MXFP, mxfp_quantize_weight
    W = (RNG.normal(size=(N, K)) * 0.02).astype(np.float32)
    W_q, scales = mxfp_quantize_weight(jnp.asarray(W, jnp.bfloat16), 4)
    return A16W4_MXFP(dtype=jnp.bfloat16).from_weights(W_q, scales)


CASES = [
    ("A16W4 gs=128 M=1", lambda: _pack_int(4, 128), 1, "decode_plane"),
    ("A16W4 gs=128 M=16", lambda: _pack_int(4, 128), 16, "decode_plane"),
    ("A16W4 gs=128 M=256", lambda: _pack_int(4, 128), 256, "prefill"),
    ("A16W4 gs=128 M=4096", lambda: _pack_int(4, 128), 4096,
     "dense_fallback"),
    ("A16W8 gs=K M=1 (byte planes)", lambda: _pack_int(8, None), 1,
     "decode_plane"),
    ("A16W2 gs=128 M=1", lambda: _pack_int(2, 128), 1, "decode_plane"),
    ("A16W1 gs=128 M=1", lambda: _pack_int(1, 128), 1, "decode_plane"),
    ("A8W8 INT8 dyn M=1", _int8_dyn, 1, "int8_exact"),
    ("A8W8 INT8 dyn M=64", _int8_dyn, 64, "int8_exact"),
    ("A8W8 FP8 dyn (nosub) M=1", _fp8_dyn, 1, "decode_plane"),
    ("A8W8 FP8 dyn (cascade) M=1",
     lambda: _fp8_dyn(flush_subnormals=False), 1, "decode_plane"),
    ("BitNet W1.58 M=1", _bitnet, 1, "decode_plane"),
    ("BitNet W1.58 M=256", _bitnet, 256, "prefill"),
    ("MXFP4 A16 M=1", _mxfp4, 1, "decode_plane"),
    ("MXFP4 A16 M=256", _mxfp4, 256, "prefill"),
]


@pytest.mark.parametrize("label,builder,M,expect",
                         CASES, ids=[c[0] for c in CASES])
def test_dispatch_pin(label, builder, M, expect):
    layer = builder()
    got = _served(layer, M)
    assert got == expect, (
        f"{label}: dispatch served [{got}], BENCH_MATRIX measured [{expect}] "
        f"— a routing regression would invalidate the committed numbers")


def test_mx_x2_default_and_legacy_flat_equivalence():
    """MXFP4 pack now defaults to the x2 re-encode (meta.mx_x2, the 14-op
    plane build); the legacy codec (x2 disabled) still gets the flat-dot
    flag, and x2 / legacy-flat / legacy-batched all agree at the oracle
    tolerance. Serialization keeps each layer's codec."""
    from gemlite_tpu.core import set_mx_x2
    from gemlite_tpu.mx import A16W4_MXFP, mxfp_quantize_weight
    from gemlite_tpu.ops.pallas_decode import pallas_decode_matmul
    W = jnp.asarray(RNG.normal(size=(512, 1024)) * 0.02, jnp.bfloat16)
    Wq, sc = mxfp_quantize_weight(W, 4)
    lay = A16W4_MXFP(dtype=jnp.bfloat16).from_weights(Wq, sc)
    assert lay.mx_x2 == 1 and lay.mx_flat == 0
    set_mx_x2(False)
    try:
        lay0 = A16W4_MXFP(dtype=jnp.bfloat16).from_weights(Wq, sc)
    finally:
        set_mx_x2(True)
    assert lay0.mx_x2 == 0 and lay0.mx_flat == 1
    x = jnp.asarray(RNG.normal(size=(1, 1024)) * 0.3, jnp.bfloat16)
    y_x2 = pallas_decode_matmul(x, lay.W_q, lay.scales, lay.zeros, None,
                                lay.meta)
    y_flat = pallas_decode_matmul(x, lay0.W_q, lay0.scales, lay0.zeros, None,
                                  lay0.meta)
    y_batch = pallas_decode_matmul(x, lay0.W_q, lay0.scales, lay0.zeros, None,
                                   lay0.meta._replace(mx_flat=0))
    a = np.asarray(y_x2, np.float32)
    for other in (y_flat, y_batch):
        b = np.asarray(other, np.float32)
        rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-12)
        assert rel < 2e-3, rel
    # serialization round-trip keeps each codec; legacy dicts re-scan flat
    for src, want_x2, want_flat in ((lay, 1, 0), (lay0, 0, 1)):
        sd = src.state_dict()
        re = GemLiteLinear.__new__(GemLiteLinear)
        re.bias = None
        re.load_state_dict(sd)
        assert re.mx_x2 == want_x2 and re.mx_flat == want_flat
    sd2 = dict(lay0.state_dict())
    sd2.pop("mx_flat", None)
    re2 = GemLiteLinear.__new__(GemLiteLinear)
    re2.bias = None
    re2.load_state_dict(sd2)
    assert re2.mx_x2 == 0
    assert re2.mx_flat == 1  # re-scan of in-range e8m0 scales


def test_mx_x2_rejects_min_e8m0_exponent():
    """A layer whose e8m0 scale exponents include E=1 must NOT take the x2
    re-encode: the pre-decrement would store E'=0, which every e8m0 decoder
    maps to 0.0 (not 2^-126), silently zeroing the group. Unreachable from
    the in-repo quantizer (clamps E>=97) but reachable via from_weights with
    externally produced MXFP4 checkpoints."""
    from gemlite_tpu.mx import A16W4_MXFP, mxfp_quantize_weight
    W = jnp.asarray(RNG.normal(size=(128, 256)) * 0.02, jnp.bfloat16)
    Wq, sc = mxfp_quantize_weight(W, 4)
    sc_low = np.asarray(sc).copy()
    sc_low[0, 0] = 1                      # externally-produced tiny scale
    lay = A16W4_MXFP(dtype=jnp.bfloat16).from_weights(Wq, jnp.asarray(sc_low))
    assert lay.mx_x2 == 0
    # E=2 everywhere is fine (decrements to 1, still a valid e8m0 normal)
    sc_ok = np.maximum(np.asarray(sc), 2).astype(np.uint8)
    lay2 = A16W4_MXFP(dtype=jnp.bfloat16).from_weights(Wq, jnp.asarray(sc_ok))
    assert lay2.mx_x2 == 1


def test_fp8_nosub_flag_controls_fast_path():
    """The pack-time subnormal scan must gate the fast fp8 plane decode:
    flushed quantizer -> flag 1; raw quantizer + tiny weights -> flag 0."""
    from gemlite_tpu.helper import A8W8_FP8_dynamic
    W = (RNG.normal(size=(256, 512)) * 0.02).astype(np.float32)
    lay = A8W8_FP8_dynamic(dtype=jnp.bfloat16).from_weights(W)
    assert lay.fp8_nosub == 1
    W2 = W.copy()
    W2[:, 0] = np.abs(W).max(axis=1) * 1e-5
    lay2 = A8W8_FP8_dynamic(dtype=jnp.bfloat16,
                            flush_subnormals=False).from_weights(W2)
    assert lay2.fp8_nosub == 0
    # round-trip: the flag must survive serialization (old checkpoints
    # without it are re-scanned on load)
    sd = lay.state_dict()
    re = GemLiteLinear.__new__(GemLiteLinear)
    re.bias = None
    re.load_state_dict(sd)
    assert re.fp8_nosub == 1
    sd2 = dict(lay2.state_dict())
    assert "fp8_nosub" not in sd2  # zero flag is not stored
    re2 = GemLiteLinear.__new__(GemLiteLinear)
    re2.bias = None
    re2.load_state_dict(sd2)
    assert re2.fp8_nosub == 0
    # legacy checkpoint: no flag key but subnormal-free codes -> re-scan sets 1
    sd3 = dict(lay.state_dict())
    sd3.pop("fp8_nosub", None)
    re3 = GemLiteLinear.__new__(GemLiteLinear)
    re3.bias = None
    re3.load_state_dict(sd3)
    assert re3.fp8_nosub == 1
