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


def test_mxfp8_prefill_scaled_build_bit_exact():
    """The 3-op 'scaled' fp8 prefill build (fp8_nosub == 2: the biased e8m0
    decode folds the planes' 2**-gap back in) must be BIT-exact vs the 8-op
    'true' build, and the pack-time scan must grade the flag correctly."""
    layer, w = _layer(A16W8_MXFP())
    assert layer.fp8_nosub == 2, "quantizer scales are mid-range: expect 2"
    meta = layer.meta
    N, K, M = layer.out_features, layer.in_features, 100
    cfg = select_prefill_config(meta, M, N, K)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
    got2 = pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                 None, meta, cfg, interpret=True)
    got1 = pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                 None, meta._replace(fp8_nosub=1), cfg,
                                 interpret=True)
    assert np.array_equal(np.asarray(got2, np.float32),
                          np.asarray(got1, np.float32))
    # out-of-range scale exponents must hold the flag at 1 (E + 120 > 254
    # would decode to inf through the biased path)
    from gemlite_tpu.mx import pack_mxfp_layer, mxfp_quantize_weight
    W_q8, sc8 = mxfp_quantize_weight(np.asarray(w, np.float32), 8)
    sc_hot = np.full(np.asarray(sc8).shape, 200, np.uint8)
    hot = pack_mxfp_layer(W_q8, jnp.asarray(sc_hot), 8)
    assert hot.fp8_nosub == 1


class TestE5M2Weights:
    """MXFP8 layers with e5m2 weight bytes: the kernels must select the e5m2
    bit remap (w_code_dtype static), and both kernel regimes must agree with
    a numpy dense reference built from the true e5m2 values."""

    def _dense_ref(self, layer, x):
        import jax
        from gemlite_tpu.bitpack import unfold_rows_for_planes, unpack_over_rows
        K = layer.in_features
        codes = unpack_over_rows(layer.W_q, 8, K)  # (K, N) bit patterns
        if layer.meta.w_layout:
            codes = unfold_rows_for_planes(codes, 2, layer.group_size)
        vals = np.asarray(jax.lax.bitcast_convert_type(
            codes, jnp.float8_e5m2).astype(jnp.float32))
        s_bits = np.asarray(layer.scales, np.uint8).astype(np.uint32) << 23
        s = s_bits.view(np.float32)  # e8m0 bits -> 2^(E-127)
        gs = K // layer.scales.shape[0]
        s_rows = np.repeat(s, gs, axis=0)
        W = vals * s_rows
        # round through bf16: layer outputs are bf16, so the comparison
        # target must carry the same output rounding
        out = np.asarray(x, np.float32) @ W
        return np.asarray(jnp.asarray(out).astype(jnp.bfloat16), np.float32)

    def test_pack_records_flavor(self):
        layer, _ = _layer(A16W8_MXFP(fp8=jnp.float8_e5m2))
        from gemlite_tpu.dtypes import DType
        assert layer.meta.w_code_dtype == DType.FP8e5.value
        e4, _ = _layer(A16W8_MXFP())
        # e4m3 flavor is explicitly recorded since round 3 (0 only in
        # pre-existing checkpoints, still accepted by fp8_coded())
        assert e4.meta.w_code_dtype == DType.FP8e4.value

    @pytest.mark.parametrize("M", [1, 100])
    def test_kernels_match_dense_e5m2(self, M):
        N, K = 256, 512
        layer, w = _layer(A16W8_MXFP(fp8=jnp.float8_e5m2))
        meta = layer.meta
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
        if M <= 64:
            cfg = select_decode_config(meta, M, N, K)
            assert can_use_decode_kernel(meta, M, N, K, cfg)
            got = pallas_decode_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                       None, meta, cfg, interpret=True)
        else:
            cfg = select_prefill_config(meta, M, N, K)
            assert can_use_prefill_kernel(meta, M, N, K, cfg)
            got = pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                        None, meta, cfg, interpret=True)
        want = self._dense_ref(layer, x)
        d = np.mean(np.abs(np.asarray(got, np.float32) - want))
        s = np.mean(np.abs(want)) + 1e-9
        assert d / s < 1e-3, d / s
        # and the oracle agrees on the flavor too
        ref = mx_forward_ref(x, layer.W_q, layer.scales, None, None, meta)
        d2 = np.mean(np.abs(np.asarray(ref, np.float32) - want))
        assert d2 / s < 1e-3, d2 / s

    def test_serialization_roundtrip_keeps_flavor(self, tmp_path):
        from gemlite_tpu import GemLiteLinear
        layer, _ = _layer(A16W8_MXFP(fp8=jnp.float8_e5m2))
        p = str(tmp_path / "e5.npz")
        layer.save(p)
        loaded = GemLiteLinear.load(p)
        assert loaded.meta.w_code_dtype == layer.meta.w_code_dtype
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(2, layer.in_features)), jnp.bfloat16)
        a = np.asarray(layer(x), np.float32)
        b = np.asarray(loaded(x), np.float32)
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


class TestNVFP4FastPath:
    """NVFP4 (gs=16) routes through the prefill kernel's pair-fused build in
    BOTH regimes (the 16-group batched raw-dot would stall the MXU), matching
    the MX oracle."""

    def _nv_layer(self, N=256, K=512):
        from gemlite_tpu.mx import A4W4_NVFP_dynamic
        rng = np.random.default_rng(11)
        w = (rng.normal(size=(N, K)) * 0.02).astype(np.float32)
        o = types.SimpleNamespace()
        o.weight = w
        o.bias = None
        return A4W4_NVFP_dynamic().from_linear(o, del_orig=False), w

    @pytest.mark.parametrize("M", [1, 8, 100])
    def test_prefill_kernel_matches_oracle(self, M):
        N, K = 256, 512
        layer, w = self._nv_layer(N, K)
        # dispatch rewrites csm 4 -> 0 after fake-quantizing activations;
        # the kernel itself sees plain bf16 activations
        meta = layer.meta._replace(channel_scale_mode=0)
        cfg = select_prefill_config(meta, M, N, K)
        assert can_use_prefill_kernel(meta, M, N, K, cfg), cfg
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
        got = pallas_prefill_matmul(x, layer.W_q, layer.scales, layer.zeros,
                                    None, meta, cfg, interpret=True)
        want = mx_forward_ref(x, layer.W_q, layer.scales, None, None, meta)
        d = float(jnp.mean(jnp.abs(got.astype(jnp.float32) -
                                   want.astype(jnp.float32))))
        s = float(jnp.mean(jnp.abs(want.astype(jnp.float32)))) + 1e-9
        # NVFP4 scales (fp8-e4m3 x 0.05) are not powers of two, so the bf16
        # dequant cache rounds value*scale (~2^-9 rel) — unlike the e8m0
        # MXFP paths this is not bit-exact, but it is far inside the fp4
        # quantization error (~1e-1)
        assert d / s < 5e-3, d / s

    def test_dispatch_end_to_end(self):
        """Full layer call (dynamic NVFP4 activations) stays accurate."""
        N, K = 256, 512
        layer, w = self._nv_layer(N, K)
        rng = np.random.default_rng(13)
        for M in (1, 4, 100):
            x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.bfloat16)
            y = layer(x)
            ref = np.asarray(x, np.float32) @ w.T
            rel = np.mean(np.abs(np.asarray(y, np.float32) - ref)) / \
                (np.mean(np.abs(ref)) + 1e-9)
            assert rel < 2e-1, (M, rel)


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
