# SPDX-License-Identifier: Apache-2.0
"""Golden-vector parity tests vs the reference's torch dequant semantics.

The reference dequantizes inside its Triton kernels with mode-dependent CAST
ORDERS (/root/reference/gemlite/triton_kernels/utils.py:57-89):

    mode 1:              b.to(meta) - zeros
    mode 2:              b.to(meta) * scales
    mode 3 (scalar z):   (b - zeros).to(meta) * scales     # int sub FIRST
    mode 3 (tensor z):   (b.to(meta) - zeros) * scales
    mode 4 (fma):        b.to(meta) * scales + zeros'
      with pack-time     zeros' = (-zeros.float() * scales.float()).to(z.dtype)
      folding            (/root/reference/gemlite/core.py:434-436)

These are easy to silently diverge from (SURVEY §7 "hard parts"); this module
regenerates each formula independently in torch (CPU) and pins:

  (a) pack() decision tree  -> expected (W_group_mode, channel_scale_mode)
  (b) pack-time fma folding -> bit-exact stored zeros
  (c) oracle dequantized weights -> BIT-EXACT fp16 vs the torch formulas
  (d) forward outputs (oracle + every kernel family, decode + prefill M)
      within 1e-3 relative of the golden fp32 matmul
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gemlite_tpu import DType, GemLiteLinear
from gemlite_tpu.core import GEMLITE_MATMUL_TYPES
from gemlite_tpu.ops.reference import dequantize_ref, unpack_rows_ref

N, K = 256, 512


def _torch_dequant(b_codes, scales_nk, zeros, mode, zero_is_scalar):
    """The reference utils.py:57-89 formulas, meta_dtype = fp16, on (K, N)."""
    b = torch.as_tensor(np.asarray(b_codes, np.int64), dtype=torch.int32)
    meta = torch.float16
    if mode == 0:
        return b
    s = None
    if scales_nk is not None:
        G = scales_nk.shape[1]
        s = torch.as_tensor(scales_nk.T.copy())            # (G, N)
        s = s.repeat_interleave(K // G, dim=0).to(meta)    # (K, N)
    if mode == 1:
        z = torch.tensor(float(zeros), dtype=meta) if zero_is_scalar else None
        return b.to(meta) - z
    if mode == 2:
        return b.to(meta) * s
    if mode == 3:
        if zero_is_scalar:
            return (b - int(zeros)).to(meta) * s
        zt = torch.as_tensor(zeros.T.copy()).repeat_interleave(
            K // zeros.shape[1], dim=0).to(meta)
        return (b.to(meta) - zt) * s
    if mode == 4:
        # zeros arrives PRE-FOLDED (z' = -z*s in the storage dtype)
        zt = torch.as_tensor(zeros.T.copy()).repeat_interleave(
            K // zeros.shape[1], dim=0).to(meta)
        return b.to(meta) * s + zt
    raise ValueError(mode)


def _make_case(case):
    rng = np.random.default_rng(0xC0FFEE)
    if case == "w4_g64_fma":           # HQQ default: mode 4 + fma folding
        codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
        scales = rng.uniform(2.0**-11, 2.0**-8, (N, K // 64)).astype(np.float16)
        zeros = rng.integers(0, 16, (N, K // 64)).astype(np.float16)
        return 4, 64, codes, scales, zeros, True, (4, 0)
    if case == "w4_g64_asym":          # fma_mode=False: mode 3 tensor zeros
        codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
        scales = rng.uniform(2.0**-11, 2.0**-8, (N, K // 64)).astype(np.float16)
        zeros = rng.integers(0, 16, (N, K // 64)).astype(np.float16)
        return 4, 64, codes, scales, zeros, False, (3, 0)
    if case == "w4_g128_sym":          # no zeros: mode 2
        codes = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
        scales = rng.uniform(2.0**-11, 2.0**-8, (N, K // 128)).astype(np.float16)
        return 4, 128, codes, scales, None, True, (2, 0)
    if case == "w8_g64_scalar_zero":   # scalar zero: mode 3 INT-SUB-FIRST
        codes = rng.integers(0, 256, size=(N, K)).astype(np.uint8)
        scales = rng.uniform(2.0**-12, 2.0**-9, (N, K // 64)).astype(np.float16)
        return 8, 64, codes, scales, 128, True, (3, 0)
    if case == "w2_bitnet":            # ternary: shift-only mode 1 + csm 1
        codes = rng.integers(0, 3, size=(N, K)).astype(np.uint8)
        scales = np.full((N, 1), 0.025, np.float16)
        return 2, K, codes, scales, 1, True, (1, 1)
    raise ValueError(case)


CASES = ["w4_g64_fma", "w4_g64_asym", "w4_g128_sym", "w8_g64_scalar_zero",
         "w2_bitnet"]


@pytest.mark.parametrize("case", CASES)
def test_golden_dequant_bit_exact(case):
    W_nbits, gs, codes, scales, zeros, fma_mode, expect_modes = _make_case(case)
    layer = GemLiteLinear(W_nbits, gs, K, N, DType.FP16, DType.FP16).pack(
        codes, scales, zeros, fma_mode=fma_mode)

    # (a) decision tree parity
    assert (layer.W_group_mode, layer.channel_scale_mode) == expect_modes, case

    # (b) fma folding bit-exactness (reference core.py:434-436)
    if layer.W_group_mode == 4:
        golden_folded = (-torch.as_tensor(zeros.astype(np.float32))
                         * torch.as_tensor(scales.astype(np.float32))
                         ).to(torch.float16).numpy().T
        ours = np.asarray(layer.zeros)
        assert ours.dtype == golden_folded.dtype
        np.testing.assert_array_equal(ours.view(np.uint16),
                                      golden_folded.view(np.uint16))

    # (c) dequantized weights bit-exact vs the torch formulas
    b = unpack_rows_ref(layer.W_q, W_nbits, layer.elements_per_sample, K,
                        w_layout=layer.meta.w_layout, group_size=gs,
                        input_dtype=layer.meta.input_dtype)
    ours_deq = dequantize_ref(
        b, layer.scales, layer.zeros,
        W_group_mode=layer.W_group_mode,
        meta_dtype=layer.meta.meta_dtype,
        zero_is_scalar=layer.zero_is_scalar,
    )
    scales_arg = None if layer.W_group_mode == 1 else scales
    zeros_arg = (np.asarray(layer.zeros).T if layer.W_group_mode == 4 else zeros)
    golden_deq = _torch_dequant(codes.T, scales_arg, zeros_arg,
                                layer.W_group_mode, layer.zero_is_scalar)
    ours_np = np.asarray(ours_deq.astype(jnp.float16))
    np.testing.assert_array_equal(
        ours_np.view(np.uint16), golden_deq.numpy().view(np.uint16),
        err_msg=f"{case}: dequant cast-order mismatch")


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("M", [1, 128])
def test_golden_forward_outputs(case, M):
    W_nbits, gs, codes, scales, zeros, fma_mode, _ = _make_case(case)
    layer = GemLiteLinear(W_nbits, gs, K, N, DType.FP16, DType.FP16).pack(
        codes, scales, zeros, fma_mode=fma_mode)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.25, jnp.float16)

    # golden: fp32 matmul against the fp16 golden dequant (+ csm epilogue)
    golden_deq = _torch_dequant(
        codes.T, scales if layer.W_group_mode in (2, 3, 4) else None,
        (np.asarray(layer.zeros).T if layer.W_group_mode == 4 else zeros),
        layer.W_group_mode, layer.zero_is_scalar)
    W = golden_deq.numpy().astype(np.float32)               # (K, N)
    y_gold = np.asarray(x, np.float32) @ W
    if layer.channel_scale_mode == 1:
        y_gold = y_gold * np.asarray(layer.scales, np.float32).reshape(1, -1)
    scale_ref = max(float(np.mean(np.abs(y_gold))), 1e-6)

    # oracle: same dequant chain (fp16 materialization + f32 dot); the only
    # deviation left is the final fp16 OUTPUT rounding (~2^-12 relative)
    from gemlite_tpu.core import GEMLITE_KERNEL_REGISTRY
    y_ref = GEMLITE_KERNEL_REGISTRY["_ref"](
        jnp.reshape(x, (-1, K)), layer.W_q, layer.scales, layer.zeros, None,
        layer.meta)
    rel = float(jnp.mean(jnp.abs(y_ref.astype(jnp.float32) - y_gold))) / scale_ref
    assert rel < 5e-4, f"{case} M={M} oracle: rel={rel:.2e}"

    # Pallas kernels: x is computed in bf16 (3 fewer mantissa bits than the
    # reference's fp16) with an EXACT f32 post-dot correction, so the expected
    # deviation from the fp16-materialized golden is ~2^-8 relative
    for mt in GEMLITE_MATMUL_TYPES:
        y = layer.forward_manual(x, matmul_type=mt)
        rel = float(jnp.mean(jnp.abs(y.astype(jnp.float32) - y_gold))) / scale_ref
        assert rel < 5e-3, f"{case} M={M} {mt}: rel={rel:.2e}"
