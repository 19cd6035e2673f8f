"""Bit-packing tests: round-trip identity + exact layout parity with the
reference algorithm (LSB-first packing, reference bitpack.py:36-60),
re-derived here as an independent loop-based numpy implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from gemlite_tpu.bitpack import (
    pack_weights_over_cols,
    pack_weights_over_rows,
    unpack_over_cols,
    unpack_over_rows,
)

RNG = np.random.default_rng(0)


def _ref_pack_over_cols(W_q, W_nbits, packing_bitwidth):
    """Independent loop-based reimplementation of LSB-first packing semantics."""
    elems = packing_bitwidth // W_nbits
    out = np.zeros((W_q.shape[0], W_q.shape[1] // elems), dtype=np.int64)
    for j in range(W_q.shape[1]):
        col = j // elems
        shift = (j % elems) * W_nbits
        out[:, col] |= W_q[:, j].astype(np.int64) << shift
    return out


@pytest.mark.parametrize("W_nbits", [1, 2, 4, 8])
@pytest.mark.parametrize("packing_bitwidth", [8, 16, 32])
def test_pack_over_cols_layout_parity(W_nbits, packing_bitwidth):
    if packing_bitwidth < W_nbits:
        pytest.skip("invalid combo")
    N, K = 16, 64
    W_q = RNG.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    packed, elems = pack_weights_over_cols(W_q, W_nbits, packing_bitwidth, transpose=False)
    assert elems == packing_bitwidth // W_nbits
    ref = _ref_pack_over_cols(W_q, W_nbits, packing_bitwidth)
    # compare as unsigned bit patterns
    mask = (1 << packing_bitwidth) - 1
    got = np.asarray(packed).astype(np.int64) & mask
    assert np.array_equal(got, ref & mask)


@pytest.mark.parametrize("W_nbits", [1, 2, 4, 8])
@pytest.mark.parametrize("packing_bitwidth", [8, 16, 32, 64])
@pytest.mark.parametrize("transpose", [False, True])
def test_pack_unpack_roundtrip_cols(W_nbits, packing_bitwidth, transpose):
    N, K = 8, 128
    W_q = RNG.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    packed, elems = pack_weights_over_cols(W_q, W_nbits, packing_bitwidth, transpose=transpose)
    if transpose:
        assert packed.shape == (K // elems, N)
        packed = packed.T
    unpacked = unpack_over_cols(packed, W_nbits, K)
    assert np.array_equal(np.asarray(unpacked), W_q)


@pytest.mark.parametrize("W_nbits", [1, 2, 4, 8])
@pytest.mark.parametrize("packing_bitwidth", [8, 16, 32, 64])
def test_pack_unpack_roundtrip_rows(W_nbits, packing_bitwidth):
    K, N = 128, 8
    W_q = RNG.integers(0, 2**W_nbits, size=(K, N)).astype(np.uint8)
    packed, elems = pack_weights_over_rows(W_q, W_nbits, packing_bitwidth)
    assert packed.shape == (K // elems, N)
    unpacked = unpack_over_rows(packed, W_nbits, K)
    assert np.array_equal(np.asarray(unpacked), W_q)


def test_pack_64bit_normalizes_to_32():
    """64-bit words == two 32-bit words, same bit layout (no int64 on TPU)."""
    N, K = 4, 64
    W_nbits = 4
    W_q = RNG.integers(0, 16, size=(N, K)).astype(np.uint8)
    p64, e64 = pack_weights_over_cols(W_q, W_nbits, 64, transpose=False)
    p32, e32 = pack_weights_over_cols(W_q, W_nbits, 32, transpose=False)
    assert e64 == e32 == 8
    assert np.array_equal(np.asarray(p64), np.asarray(p32))
    # byte-level equivalence with a true int64 LSB-first packing
    ref64 = _ref_pack_over_cols(W_q, W_nbits, 64).astype(np.int64)
    assert np.array_equal(ref64.view(np.int32).reshape(N, -1), np.asarray(p32))


def test_packed_dtypes():
    W_q = RNG.integers(0, 16, size=(8, 32)).astype(np.uint8)
    assert pack_weights_over_cols(W_q, 4, 8)[0].dtype == jnp.uint8
    assert pack_weights_over_cols(W_q, 4, 16)[0].dtype == jnp.int16
    assert pack_weights_over_cols(W_q, 4, 32)[0].dtype == jnp.int32
