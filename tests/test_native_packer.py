# SPDX-License-Identifier: Apache-2.0
"""Native C++ packer: bit-identical with the jnp packer, round-trips, and is
picked up transparently by pack_weights_over_cols for numpy inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from gemlite_tpu import native
from gemlite_tpu.bitpack import pack_weights_over_cols

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("W_nbits,bitwidth", [
    (4, 32), (2, 32), (1, 32), (8, 32), (4, 8), (8, 8), (4, 16), (2, 64),
])
def test_matches_jnp_packer(W_nbits, bitwidth):
    rng = np.random.default_rng(0)
    N, K = 64, 256
    W = rng.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    got = native.pack_over_cols_np(W, W_nbits, bitwidth)
    want, elems = pack_weights_over_cols(jnp.asarray(W), W_nbits, bitwidth,
                                         transpose=True)
    assert got is not None
    assert got.dtype == np.asarray(want).dtype
    np.testing.assert_array_equal(got, np.asarray(want))


def test_roundtrip():
    rng = np.random.default_rng(1)
    N, K = 32, 512
    W = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    packed = native.pack_over_cols_np(W, 4, 32)
    back = native.unpack_over_cols_np(packed, 4, K)
    np.testing.assert_array_equal(back, W)


def test_pack_weights_over_cols_uses_native_for_numpy():
    rng = np.random.default_rng(2)
    W = rng.integers(0, 16, size=(128, 256)).astype(np.uint8)
    a, _ = pack_weights_over_cols(W, 4, 32, transpose=True)           # native
    b, _ = pack_weights_over_cols(jnp.asarray(W), 4, 32, transpose=True)  # jnp
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
