# SPDX-License-Identifier: Apache-2.0
"""Plane-fold layout (w_layout=1) invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from gemlite_tpu import DType, GemLiteLinear
from gemlite_tpu.bitpack import (
    fold_codes_for_planes,
    unfold_codes_for_planes,
    unfold_rows_for_planes,
    unpack_over_rows,
)


@pytest.mark.parametrize("n_planes,fold_gs", [(4, 128), (4, 64), (8, 64),
                                              (16, 128), (2, 32), (2, 512),
                                              (4, 32), (4, 512)])
def test_fold_unfold_roundtrip(n_planes, fold_gs):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(8, 4 * fold_gs)).astype(np.uint8)
    folded = fold_codes_for_planes(codes, n_planes, fold_gs)
    assert not np.array_equal(folded, codes)  # a real permutation
    np.testing.assert_array_equal(
        unfold_codes_for_planes(folded, n_planes, fold_gs), codes)
    # rows-orientation unfold agrees with the cols-orientation one
    np.testing.assert_array_equal(
        unfold_rows_for_planes(np.ascontiguousarray(folded.T), n_planes, fold_gs),
        codes.T)


def _mk(W_nbits, gs, N=256, K=512):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 2 ** W_nbits, size=(N, K)).astype(np.uint8)
    G = K // gs if 1 < gs < K else 1
    scales = rng.uniform(2.0**-11, 2.0**-8, (N, G)).astype(np.float32)
    zeros = rng.integers(0, 2 ** W_nbits, (N, G)).astype(np.float32)
    layer = GemLiteLinear(W_nbits, gs, K, N, DType.BF16, DType.BF16).pack(
        codes, scales, zeros)
    return layer, codes


@pytest.mark.parametrize("W_nbits,gs", [(4, 128), (4, 64), (2, 64), (8, 64),
                                        (1, 128), (4, 512)])
def test_pack_folds_and_reference_layout_roundtrip(W_nbits, gs):
    layer, codes = _mk(W_nbits, gs)
    # integer W8 folds on byte planes (w_layout=2, P=4); sub-byte on
    # halfword planes (w_layout=1)
    expect_layout = 2 if W_nbits == 8 else 1
    assert layer.w_layout == expect_layout
    assert layer.meta.w_layout == expect_layout
    # folded packing holds PERMUTED codes...
    from gemlite_tpu.bitpack import fold_plane_count
    n_planes = fold_plane_count(W_nbits, expect_layout)
    packed_codes = unpack_over_rows(layer.W_q, W_nbits, layer.in_features).T
    np.testing.assert_array_equal(
        np.asarray(packed_codes),
        np.asarray(fold_codes_for_planes(jnp.asarray(codes), n_planes, gs)))
    # ...and to_reference_layout recovers the reference packing bit-exactly
    ref = GemLiteLinear(W_nbits, gs, layer.in_features, layer.out_features,
                        DType.BF16, DType.BF16)
    from gemlite_tpu.bitpack import pack_weights_over_cols
    W_ref, _ = pack_weights_over_cols(jnp.asarray(codes), W_nbits, 32,
                                      transpose=True)
    layer.to_reference_layout()
    assert layer.w_layout == 0
    np.testing.assert_array_equal(np.asarray(layer.W_q), np.asarray(W_ref))


@pytest.mark.parametrize("W_nbits,gs", [(4, 128), (2, 64), (8, 64), (4, 512)])
@pytest.mark.parametrize("M", [1, 8, 128])
def test_folded_forward_matches_reference_layout(W_nbits, gs, M):
    layer, codes = _mk(W_nbits, gs)
    assert layer.w_layout == (2 if W_nbits == 8 else 1)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(M, layer.in_features)) * 0.2, jnp.bfloat16)
    y_folded = layer(x)

    import copy
    ref = copy.copy(layer).to_reference_layout()   # shallow copy: original
    y_ref = ref(x)                                 # keeps its folded W_q
    np.testing.assert_allclose(
        np.asarray(y_folded, np.float32), np.asarray(y_ref, np.float32),
        rtol=0, atol=1e-2 * float(np.mean(np.abs(np.asarray(y_ref, np.float32)))) + 1e-5)


def test_fold_skipped_when_not_servable():
    # gs=32 with W1 -> t_rows = 2 (sublane-misaligned): must stay layout 0
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2, size=(256, 512)).astype(np.uint8)
    scales = np.full((256, 16), 0.01, np.float32)
    layer = GemLiteLinear(1, 32, 512, 256, DType.BF16, DType.BF16).pack(
        codes, scales, None)
    assert layer.w_layout == 0


def test_state_dict_roundtrip_preserves_layout():
    layer, codes = _mk(4, 128)
    sd = layer.state_dict()
    assert "w_layout" in sd
    l2 = GemLiteLinear.__new__(GemLiteLinear)
    l2.bias = None
    l2.load_state_dict(sd)
    assert l2.w_layout == 1
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 512)) * 0.2,
                    jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(layer(x)), np.asarray(l2(x)))


def test_to_reference_layout_dynamic_mx_csm4():
    """Dynamic-MX processors set channel_scale_mode=4 AFTER pack(); export
    must recompute the fold unit with that override masked (previously:
    TypeError via a None fold unit)."""
    import numpy as np
    from gemlite_tpu.mx import A4W4_MXFP_dynamic

    rng = np.random.default_rng(0)

    class _Lin:
        weight = (rng.normal(size=(256, 256)) * 0.05).astype(np.float32)
        bias = None

    layer = A4W4_MXFP_dynamic().from_linear(_Lin(), del_orig=False)
    assert layer.meta.channel_scale_mode == 4
    if not getattr(layer, "w_layout", 0):
        return  # nothing folded for this config — export trivially fine
    layer.to_reference_layout()            # must not raise
    assert layer.w_layout == 0
