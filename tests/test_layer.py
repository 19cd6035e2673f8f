"""Layer API tests: pack() mode-decision invariants + numerics vs plain-jnp
references, across all 5 matmul_type names and batch regimes. Ported from the
reference test strategy (tests/test_gemlitelineartriton.py) onto jnp."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401  (registers kernels)
from gemlite_tpu.core import GemLiteLinear, DType
from gemlite_tpu.quant import scale_activations_per_token

MATMUL_TYPES = ["GEMV_REVSPLITK", "GEMV", "GEMV_SPLITK", "GEMM_SPLITK", "GEMM"]
COMPUTE_DTYPE = jnp.bfloat16
GEMLITE_DTYPE = DType.BF16

IN_FEATURES, OUT_FEATURES = 256, 128
W_NBITS, GROUP_SIZE = 4, 64
BATCH_SIZES = [1, 4]

RNG = np.random.default_rng(42)


def gen_data(in_features, out_features, W_nbits, group_size):
    """Synthetic HQQ-style fixture: uint8 W_q with integer zeros and power-of-two
    scales so the dequantized reference W = (W_q - z) * s is exact in fp32."""
    W_q = RNG.integers(0, 2**W_nbits - 1, size=(out_features, in_features)).astype(np.uint8)
    n_groups = W_q.size // group_size
    scales = np.full((n_groups, 1), 2.0**-10, dtype=np.float32)
    zeros = RNG.integers(0, 2**W_nbits - 1, size=(n_groups, 1)).astype(np.float32)
    W = ((W_q.reshape(-1, group_size) - zeros) * scales).reshape(out_features, in_features)
    return W.astype(np.float32), W_q, scales, zeros


W, W_q, SCALES, ZEROS = gen_data(IN_FEATURES, OUT_FEATURES, W_NBITS, GROUP_SIZE)


def _err(a, b):
    return float(jnp.mean(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32))))


def _x(batch, scale=0.1, dtype=COMPUTE_DTYPE):
    return jnp.asarray(RNG.normal(size=(batch, IN_FEATURES)) * scale, dtype=dtype)


def _run_all_types(layer, x, y_ref, tol, batch):
    for mt in MATMUL_TYPES:
        if batch > 1 and "GEMV" in mt:
            continue
        y = layer.forward_manual(x, matmul_type=mt)
        assert y.shape == y_ref.shape
        e = _err(y, y_ref)
        assert e < tol, f"{mt}: err {e} >= {tol}"


def test_serialization(tmp_path):
    layer = GemLiteLinear(W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE)
    layer.pack(W_q, SCALES, ZEROS)
    path = str(tmp_path / "layer.npz")
    layer.save(path)
    loaded = GemLiteLinear.load(path)

    assert layer.get_meta_args() == loaded.get_meta_args()
    for a, b in zip(layer.get_tensor_args(), loaded.get_tensor_args()):
        if a is None:
            assert b is None
        else:
            assert _err(a.astype(jnp.float32) if a.dtype != jnp.uint8 else a,
                        b.astype(jnp.float32) if b.dtype != jnp.uint8 else b) == 0

    x = _x(4)
    assert _err(layer.forward_manual(x, "GEMM"), loaded.forward_manual(x, "GEMM")) < 1e-7


def test_bf16xbf16():
    """Raw float weights: no unpack, no dequant (modes 0/0)."""
    layer = GemLiteLinear(W_nbits=16, group_size=None, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE, scaled_activations=False)
    layer.pack(jnp.asarray(W, COMPUTE_DTYPE), None, None, None)
    assert layer.W_group_mode == 0 and layer.channel_scale_mode == 0
    assert layer.data_contiguous is False
    for batch in BATCH_SIZES:
        x = _x(batch)
        y_ref = x.astype(jnp.float32) @ jnp.asarray(W, COMPUTE_DTYPE).astype(jnp.float32).T
        _run_all_types(layer, x, y_ref.astype(COMPUTE_DTYPE), 5e-3, batch)


@pytest.mark.parametrize("group_size", [GROUP_SIZE, IN_FEATURES])
def test_bf16xWn_asymmetric(group_size):
    Wg, W_qg, sg, zg = gen_data(IN_FEATURES, OUT_FEATURES, W_NBITS, group_size)
    layer = GemLiteLinear(W_NBITS, group_size=group_size, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE)
    layer.pack(W_qg, sg, zg)
    if group_size == IN_FEATURES:
        # channel-wise: weight-only post-scale (1,1) or grouped (3,0)
        assert (layer.W_group_mode, layer.channel_scale_mode) in [(1, 1), (3, 0)]
    else:
        assert layer.W_group_mode in (3, 4) and layer.channel_scale_mode == 0
    assert layer.data_contiguous is True

    for batch in BATCH_SIZES:
        x = _x(batch)
        y_ref = (x.astype(jnp.float32) @ jnp.asarray(Wg).T).astype(COMPUTE_DTYPE)
        _run_all_types(layer, x, y_ref, 5e-3, batch)


def test_int8xWn_symmetric_no_activation_scaling():
    layer = GemLiteLinear(W_NBITS, group_size=IN_FEATURES, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=DType.INT8,
                          output_dtype=DType.FP32, scaled_activations=False)
    w_scales = np.abs(RNG.normal(size=(OUT_FEATURES, 1))).astype(np.float32) * 1e-4
    layer.pack(W_q, scales=w_scales, zeros=7)
    assert layer.W_group_mode == 1  # shift-only in-loop
    assert layer.channel_scale_mode == 1  # channel-wise weight scale post K-sum

    for batch in BATCH_SIZES:
        x = jnp.asarray(RNG.integers(-10, 10, size=(batch, IN_FEATURES)), jnp.int8)
        y_ref = x.astype(jnp.float32) @ ((W_q.astype(np.float32) - 7) * w_scales).T
        _run_all_types(layer, x, y_ref, 1e-3, batch)


def test_int8xWn_scaled_activations():
    layer = GemLiteLinear(W_nbits=W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=DType.INT8,
                          output_dtype=DType.FP32, scaled_activations=True)
    layer.pack(W_q, scales=None, zeros=7)
    assert layer.W_group_mode == 1
    assert layer.channel_scale_mode == 2  # activations-only post-scale

    for batch in BATCH_SIZES:
        x = _x(batch, scale=0.05, dtype=jnp.float32)
        xq, sx = scale_activations_per_token(x, jnp.int8)
        y_ref = (xq.astype(jnp.float32) @ (W_q.astype(np.float32) - 7).T) * sx
        _run_all_types(layer, x, y_ref, 5e-3, batch)


def test_int8xW8_scaled_weights_scaled_activations():
    W8_q = RNG.integers(-127, 127, size=(OUT_FEATURES, IN_FEATURES)).astype(np.int8)
    w_scales = np.abs(RNG.normal(size=(OUT_FEATURES, 1))).astype(np.float32) * 1e-4
    layer = GemLiteLinear(W_nbits=8, group_size=IN_FEATURES, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=DType.INT8,
                          output_dtype=DType.FP32, scaled_activations=True)
    layer.pack(jnp.asarray(W8_q), scales=w_scales, zeros=None)
    assert layer.channel_scale_mode == 3  # weight + activation post-scale

    for batch in BATCH_SIZES:
        x = _x(batch, dtype=jnp.float32)
        xq, sx = scale_activations_per_token(x, jnp.int8)
        y_ref = (xq.astype(jnp.float32) @ (W8_q.astype(np.float32) * w_scales).T) * sx
        _run_all_types(layer, x, y_ref, 1e-3, batch)


def test_fp8xfp8():
    fp8 = jnp.float8_e4m3fn
    layer = GemLiteLinear(W_nbits=8, group_size=None, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=DType.FP8,
                          output_dtype=GEMLITE_DTYPE, scaled_activations=False)
    W8 = jnp.asarray(W, fp8)
    layer.pack(W8, None, None, None)
    assert layer.W_group_mode == 0 and layer.channel_scale_mode == 0

    for batch in BATCH_SIZES:
        x = _x(batch).astype(fp8)
        y_ref = x.astype(jnp.float32) @ W8.astype(jnp.float32).T
        _run_all_types(layer, x, y_ref.astype(COMPUTE_DTYPE), 5e-2, batch)


def test_fp8xWn_scaled_activations():
    layer = GemLiteLinear(W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=DType.FP8,
                          output_dtype=GEMLITE_DTYPE, scaled_activations=True)
    layer.pack(W_q, SCALES, ZEROS)
    assert layer.W_group_mode in (3, 4)
    assert layer.channel_scale_mode == 2

    fp8 = jnp.float8_e4m3fn
    for batch in BATCH_SIZES:
        x = _x(batch, dtype=jnp.float32)
        xq, sx = scale_activations_per_token(x, fp8)
        y_ref = (xq.astype(jnp.float32) @ jnp.asarray(W).T) * sx
        _run_all_types(layer, x, y_ref.astype(COMPUTE_DTYPE), 5e-2, batch)


def test_pytree_jit():
    """Layers are pytrees: jit over (layer, x) compiles once per config."""
    layer = GemLiteLinear(W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE)
    layer.pack(W_q, SCALES, ZEROS)

    @jax.jit
    def apply(lyr, x):
        return lyr(x)

    x = _x(4)
    y_jit = apply(layer, x)
    y_eager = layer(x)
    assert _err(y_jit, y_eager) < 1e-6


def test_batch_shape_preserved():
    layer = GemLiteLinear(W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE)
    layer.pack(W_q, SCALES, ZEROS)
    x = jnp.asarray(RNG.normal(size=(2, 3, IN_FEATURES)) * 0.1, COMPUTE_DTYPE)
    y = layer(x)
    assert y.shape == (2, 3, OUT_FEATURES)


def test_bias():
    bias = jnp.asarray(RNG.normal(size=(OUT_FEATURES,)), COMPUTE_DTYPE)
    layer = GemLiteLinear(W_NBITS, group_size=GROUP_SIZE, in_features=IN_FEATURES,
                          out_features=OUT_FEATURES, input_dtype=GEMLITE_DTYPE,
                          output_dtype=GEMLITE_DTYPE)
    layer.pack(W_q, SCALES, ZEROS, bias=bias)
    x = _x(2)
    y = layer(x)
    y_ref = (x.astype(jnp.float32) @ jnp.asarray(W).T + bias.astype(jnp.float32))
    assert _err(y, y_ref) < 5e-3


@pytest.mark.parametrize("requested", [8, 16, 64])
def test_packing_bitwidth_normalized_to_fast_path(requested):
    """pack(packing_bitwidth=8/16/64) stores int32 words (lossless container
    change under LSB-first packing) and reaches the Pallas plane kernels —
    bit-identical storage AND outputs vs a packing_bitwidth=32 pack.
    Reference context: 8-bit packing is a GPU perf knob (core.py:229)."""
    K, N, gs = 512, 256, 128
    Wf, wq, sc, zr = gen_data(K, N, W_NBITS, gs)

    def make(pb):
        return GemLiteLinear(W_NBITS, group_size=gs, in_features=K,
                             out_features=N, input_dtype=GEMLITE_DTYPE,
                             output_dtype=GEMLITE_DTYPE).pack(
                                 wq, sc, zr, packing_bitwidth=pb)

    layer = make(requested)
    base = make(32)
    assert layer.packing_bitwidth == 32
    assert layer.requested_packing_bitwidth == requested
    assert layer.elements_per_sample == 32 // W_NBITS
    assert layer.w_layout == 1, "must land on the plane-kernel folded layout"
    assert (np.asarray(layer.W_q) == np.asarray(base.W_q)).all()

    # and the folded layout actually dispatches to the Pallas decode kernel
    from gemlite_tpu.ops.pallas_decode import (can_use_decode_kernel,
                                               select_decode_config)
    cfg = select_decode_config(layer.meta, 1, N, K)
    assert can_use_decode_kernel(layer.meta, 1, N, K, cfg)

    x = jnp.asarray(RNG.normal(size=(1, K)) * 0.1, COMPUTE_DTYPE)
    y = layer(x)
    e = _err(y, x.astype(jnp.float32) @ Wf.T)
    assert e < 5e-3, e
    assert (np.asarray(y) == np.asarray(base(x))).all()


def test_a8w8_fp8_reaches_plane_kernels():
    """A8W8-FP8 weights store as packed fp8 BIT codes (4/int32, folded) and
    dispatch onto the Pallas plane kernels in both regimes — previously dense
    fp8 (elements_per_sample=1) fell to the jnp oracle at ~1/9 the decode
    bandwidth (BENCH_MATRIX r3 finding)."""
    from gemlite_tpu.helper import A8W8_FP8_dynamic
    from gemlite_tpu.ops.pallas_decode import (can_use_decode_kernel,
                                               fp8_coded,
                                               select_decode_config)
    from gemlite_tpu.ops.pallas_prefill import (can_use_prefill_kernel,
                                                select_prefill_config)
    K, N = 512, 256
    rng = np.random.default_rng(9)
    Wf = (rng.normal(size=(N, K)) * 0.05).astype(np.float32)
    layer = A8W8_FP8_dynamic(dtype=jnp.float32).from_weights(Wf)
    meta = layer.meta
    assert meta.elements_per_sample == 4 and layer.w_layout == 1
    assert fp8_coded(meta)
    assert (meta.W_group_mode, meta.channel_scale_mode) == (0, 3)

    dcfg = select_decode_config(meta, 1, N, K)
    assert can_use_decode_kernel(meta, 1, N, K, dcfg), dcfg
    pcfg = select_prefill_config(meta, 256, N, K)
    assert can_use_prefill_kernel(meta, 256, N, K, pcfg), pcfg

    from gemlite_tpu.ops.dispatch import _ref_kernel
    from gemlite_tpu.quant import scale_activations_per_token
    for M in (1, 8, 256):
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.3, jnp.float32)
        y = np.asarray(layer(x), np.float32)
        # float-product sanity (fp8 w + fp8 act quantization error ~ 4-5%)
        want = np.asarray(x, np.float32) @ Wf.T
        rel = np.abs(y - want).mean() / (np.abs(want).mean() + 1e-9)
        assert rel < 8e-2, (M, rel)
        # tight bound: kernel vs the jnp oracle on the SAME quantized layer
        xq, sx = scale_activations_per_token(x, jnp.float8_e4m3fn)
        ref = np.asarray(_ref_kernel(xq.reshape(M, K), layer.W_q, layer.scales,
                                     layer.zeros, sx, meta), np.float32)
        rel_o = np.abs(y - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel_o < 3e-3, (M, rel_o)
