"""Pallas kernel vs jnp-oracle equivalence across mode combinations, bit
widths, packing widths and batch regimes (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.core import LayerMeta, GEMLITE_ACC_DTYPE
from gemlite_tpu.dtypes import DType
from gemlite_tpu.bitpack import pack_weights_over_cols
from gemlite_tpu.ops.dispatch import _ref_kernel
from gemlite_tpu.ops.pallas_gemm import (
    pallas_fused_matmul, select_default_config, can_use_pallas,
)
from gemlite_tpu.config import KernelConfig

RNG = np.random.default_rng(7)


def _make(W_nbits, gs, K, N, W_group_mode, channel_scale_mode, zero_is_scalar,
          input_dtype=DType.BF16, packing_bitwidth=32):
    W_q = RNG.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    packed, elems = pack_weights_over_cols(W_q, W_nbits, packing_bitwidth)
    G = K // gs
    scales = jnp.asarray(RNG.normal(size=(G, N)).astype(np.float32) * 0.01)
    if zero_is_scalar:
        zeros = jnp.asarray(7, jnp.int32)
    else:
        zeros = jnp.asarray(RNG.integers(0, 2**W_nbits, size=(G, N)).astype(np.float32))
    if W_group_mode == 4:
        zeros = (-zeros * scales).astype(scales.dtype)
    meta = LayerMeta(
        scaled_activations=int(channel_scale_mode in (2, 3)),
        W_nbits=W_nbits, group_size=gs, unpack_mask=2**W_nbits - 1,
        elements_per_sample=elems,
        input_dtype=input_dtype.value, output_dtype=DType.FP32.value,
        acc_dtype=GEMLITE_ACC_DTYPE[input_dtype].value,
        meta_dtype=DType.FP32.value,
        channel_scale_mode=channel_scale_mode, W_group_mode=W_group_mode,
        data_contiguous=1, in_features=K, out_features=N,
        zero_is_scalar=int(zero_is_scalar), packing_bitwidth=packing_bitwidth,
    )
    return packed, scales, zeros, meta


def _compare(meta, packed, scales, zeros, M, tol=5e-3):
    K, N = meta.in_features, meta.out_features
    x = jnp.asarray(RNG.normal(size=(M, K)).astype(np.float32) * 0.1, jnp.bfloat16)
    sx = None
    if meta.channel_scale_mode in (2, 3):
        sx = jnp.abs(jnp.asarray(RNG.normal(size=(M, 1)).astype(np.float32))) + 0.5
    s_in = scales if meta.W_group_mode in (2, 3, 4) or meta.channel_scale_mode in (1, 3) else None
    z_in = zeros if meta.W_group_mode in (1, 3, 4) else None

    y_ref = _ref_kernel(x, packed, s_in, z_in, sx, meta)
    cfg = select_default_config(meta, M, N, K)
    assert can_use_pallas(meta, M, N, K, cfg), f"config rejected: {cfg}"
    y_pl = pallas_fused_matmul(x, packed, s_in, z_in, sx, meta, cfg)
    err = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32) - y_pl.astype(jnp.float32))))
    scale = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < tol, f"rel err {err/scale} (cfg {cfg})"


@pytest.mark.parametrize("W_group_mode,channel_scale_mode,zero_is_scalar", [
    (1, 1, True),    # shift-only + weight channel scale
    (2, 0, False),   # symmetric grouped
    (3, 0, False),   # asymmetric grouped (tensor zeros)
    (3, 0, True),    # symmetric grouped with scalar shift
    (4, 0, False),   # fma mode (folded zeros)
    (1, 2, True),    # shift + activation scaling
    (1, 3, True),    # shift + both scalings
])
@pytest.mark.parametrize("M", [1, 16, 200])
def test_modes(W_group_mode, channel_scale_mode, zero_is_scalar, M):
    gs_mode = 128
    K, N = 512, 256
    gs = K if channel_scale_mode in (1, 3) else gs_mode
    packed, scales, zeros, meta = _make(4, gs, K, N, W_group_mode,
                                        channel_scale_mode, zero_is_scalar)
    if channel_scale_mode in (1, 3):
        scales = scales[:1]  # channel-wise: (1, N)
        packed2, s, z, meta = _make(4, K, K, N, W_group_mode, channel_scale_mode,
                                    zero_is_scalar)
        _compare(meta, packed2, s, z, M)
    else:
        _compare(meta, packed, scales, zeros, M)


@pytest.mark.parametrize("W_nbits", [1, 2, 4, 8])
def test_bitwidths(W_nbits):
    # W1 packs 32 elems/word -> needs block_k >= 8*gs (aligned metadata slices)
    K = 2048 if W_nbits == 1 else 512
    N = 256
    packed, scales, zeros, meta = _make(W_nbits, 128, K, N, 3, 0, False)
    _compare(meta, packed, scales, zeros, 8)


@pytest.mark.parametrize("packing_bitwidth", [8, 16, 32])
def test_packing_widths(packing_bitwidth):
    K, N = 512, 256
    packed, scales, zeros, meta = _make(4, 128, K, N, 4, 0, False,
                                        packing_bitwidth=packing_bitwidth)
    _compare(meta, packed, scales, zeros, 4)


def test_nonpacked_8bit():
    """elements_per_sample == 1: raw int8 weights, mode 0 + channel scales."""
    K, N = 512, 256
    W8 = RNG.integers(-100, 100, size=(N, K)).astype(np.int8)
    scales = jnp.asarray(np.abs(RNG.normal(size=(1, N))).astype(np.float32) * 1e-3)
    meta = LayerMeta(
        scaled_activations=0, W_nbits=8, group_size=K, unpack_mask=255,
        elements_per_sample=1, input_dtype=DType.BF16.value,
        output_dtype=DType.FP32.value, acc_dtype=DType.FP32.value,
        meta_dtype=DType.FP32.value, channel_scale_mode=1, W_group_mode=0,
        data_contiguous=0, in_features=K, out_features=N,
        zero_is_scalar=0, packing_bitwidth=32,
    )
    _compare(meta, jnp.asarray(W8.T), scales, None, 16)


def test_int8_mxu_path():
    """int8 activations + scalar-shift weights: int8xint8->int32 MXU path."""
    K, N = 512, 256
    packed, scales, zeros, meta = _make(4, K, K, N, 1, 2, True, input_dtype=DType.INT8)
    M = 8
    x = jnp.asarray(RNG.integers(-20, 20, size=(M, K)), jnp.int8)
    sx = jnp.abs(jnp.asarray(RNG.normal(size=(M, 1)).astype(np.float32))) + 0.5
    y_ref = _ref_kernel(x, packed, None, zeros, sx, meta)
    cfg = select_default_config(meta, M, N, K)
    y_pl = pallas_fused_matmul(x, packed, None, zeros, sx, meta, cfg)
    err = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32) - y_pl.astype(jnp.float32))))
    scale = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 1e-3, err / scale


@pytest.mark.parametrize("e5m2", [False, True])
def test_fp8_codec_exhaustive(e5m2):
    """All 256 fp8 codes decode bit-exactly vs ml_dtypes through the kernel
    codec (_fp8_planes), including subnormals and signed zero. The only
    excluded codes are the non-finite ones (e4m3fn NaN / e5m2 inf+nan),
    whose documented decode is the normal-formula extension."""
    import ml_dtypes
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gemlite_tpu.ops.pallas_decode import _fp8_planes

    codes = np.arange(256, dtype=np.uint32)
    # every byte of word i = code i -> both halfwords of both planes = code i
    w = np.broadcast_to((codes * 0x01010101)[:, None], (256, 128))
    w = np.ascontiguousarray(w).view(np.int32).reshape(256, 128)

    def kern(w_ref, o_ref):
        planes = _fp8_planes(w_ref[...], c=1, t_rows=512, bn=128, e5m2=e5m2)
        o_ref[...] = jnp.stack(
            [p.reshape(512, 128) for p in planes], 0).astype(jnp.float32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, 512, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(w))
    out = np.asarray(out)

    dt = ml_dtypes.float8_e5m2 if e5m2 else ml_dtypes.float8_e4m3fn
    truth = codes.astype(np.uint8).view(dt).astype(np.float32)
    finite = np.isfinite(truth)
    # bitcast row split: word i -> plane rows 2i (low half) and 2i+1 (high)
    got = out[:, 0::2, :]  # (2 planes, 256 words, 128 lanes)
    for j in range(2):
        for half in (got[j], out[j, 1::2, :]):
            assert (half[finite] == truth[finite, None]).all(), (
                np.where((half[:, 0] != truth) & finite))
            assert (np.signbit(half[finite]) == np.signbit(truth[finite, None])).all()


@pytest.mark.parametrize("e5m2", [False, True])
@pytest.mark.parametrize("variant", ["true", "scaled"])
def test_fp8_codec_nosub_variants(e5m2, variant):
    """The subnormal-free fast remaps (meta.fp8_nosub) decode every NORMAL
    finite code and +-0 bit-exactly vs ml_dtypes: 'true' gives true values
    (prefill), 'scaled' gives value * 2^-gap (decode; gap folded back here).
    Subnormal codes are excluded — the pack-time scan guarantees absence."""
    import ml_dtypes
    import jax
    from jax.experimental import pallas as pl
    from gemlite_tpu.ops.pallas_decode import _fp8_planes

    codes = np.arange(256, dtype=np.uint32)
    w = np.broadcast_to((codes * 0x01010101)[:, None], (256, 128))
    w = np.ascontiguousarray(w).view(np.int32).reshape(256, 128)

    def kern(w_ref, o_ref):
        planes = _fp8_planes(w_ref[...], c=1, t_rows=512, bn=128, e5m2=e5m2,
                             nosub=variant)
        o_ref[...] = jnp.stack(
            [p.reshape(512, 128) for p in planes], 0).astype(jnp.float32)

    out = np.asarray(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, 512, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(w)))

    dt = ml_dtypes.float8_e5m2 if e5m2 else ml_dtypes.float8_e4m3fn
    truth = codes.astype(np.uint8).view(dt).astype(np.float32)
    if variant == "scaled":
        truth = truth * 2.0 ** -(112 if e5m2 else 120)
    exp_m, man_m = (0x7C, 0x03) if e5m2 else (0x78, 0x07)
    sub = ((codes & exp_m) == 0) & ((codes & man_m) != 0)
    ok = np.isfinite(codes.astype(np.uint8).view(dt).astype(np.float32)) & ~sub
    for j in range(2):
        for half in (out[j, 0::2, :], out[j, 1::2, :]):
            assert (half[ok] == truth[ok, None]).all(), (
                variant, np.where((half[:, 0] != truth) & ok))
            assert (np.signbit(half[ok]) == np.signbit(truth[ok, None])).all()


def test_deep_k_aligned_slices():
    """bk = 8*gs exercises the 8-aligned multi-row metadata slice path."""
    K, N, gs = 2048, 256, 32
    packed, scales, zeros, meta = _make(4, gs, K, N, 4, 0, False, packing_bitwidth=8)
    cfg = KernelConfig(block_m=16, block_n=128, block_k=8 * gs)
    assert can_use_pallas(meta, 1, N, K, cfg)
    M = 1
    x = jnp.asarray(RNG.normal(size=(M, K)).astype(np.float32) * 0.1, jnp.bfloat16)
    y_ref = _ref_kernel(x, packed, scales, zeros, None, meta)
    y_pl = pallas_fused_matmul(x, packed, scales, zeros, None, meta, cfg)
    err = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32) - y_pl.astype(jnp.float32))))
    scale = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 5e-3, err / scale


def test_fp4x2_codec_exhaustive():
    """The packed-domain x2 remap (quant.fp4x2_remap_packed) composed with
    the x2 codebook must reproduce exactly 2x the fp4 value for ALL 16
    codes, at every nibble position of the int32 word."""
    from gemlite_tpu.quant import (fp4_dequant, fp4x2_dequant,
                                   fp4x2_remap_packed)
    codes = np.arange(16, dtype=np.uint8)
    v2 = 2.0 * np.asarray(fp4_dequant(jnp.asarray(codes)))
    for pos in range(8):
        w = np.uint32(0)
        words = []
        for c in codes:
            words.append(np.uint32(c) << (4 * pos))
        packed = jnp.asarray(np.asarray(words, np.uint32).astype(np.int64)
                             & 0xFFFFFFFF, jnp.uint32).astype(jnp.int32)
        remapped = np.asarray(fp4x2_remap_packed(packed)).astype(np.uint32)
        rc = (remapped >> (4 * pos)) & 0xF
        got = np.asarray(fp4x2_dequant(jnp.asarray(rc.astype(np.uint8))))
        np.testing.assert_array_equal(got, v2)
        # other nibbles stay zero -> remap to the zero MARKER (code 1),
        # which still decodes to 0
        others = np.asarray(fp4x2_dequant(jnp.asarray(
            np.stack([(remapped >> (4 * p)) & 0xF
                      for p in range(8) if p != pos]).astype(np.uint8))))
        assert np.all(others == 0.0)
