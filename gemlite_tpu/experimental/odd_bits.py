# SPDX-License-Identifier: Apache-2.0
"""Experimental odd bit-width (W3/W5) quantized linears via dual-plane packing.

Mirrors the reference's experimental kernels (triton_kernels/experimental/
A16W3_gemm.py:212-231, A16W5_gemm.py) where an odd bit-width is stored as two
separately packed power-of-two planes: W3 = 1-bit plane + 2-bit plane,
W5 = 1-bit + 4-bit; the kernel reconstructs ``b = (b_hi << 1) | b_lo``
(A16W3_gemm.py:129-139) before the usual (b - z) * s dequant.

TPU design: both planes are packed with the standard LSB-first int32 engine
(bitpack.py) and the reconstruction + dequant + matmul runs as one fused XLA
computation. Like the reference, this is not wired into the core dispatch —
it is an API-parity capability with its own mini layer class
(A16W3_gemm.py:180-248).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bitpack import pack_weights_over_cols, unpack_over_cols
from ..dtypes import DType, to_jax_dtype

__all__ = ["OddBitLinear", "A16W3", "A16W5"]

_PLANES = {3: (1, 2), 5: (1, 4)}  # (low_bits, high_bits)


class OddBitLinear:
    """W3/W5 grouped asymmetric quantized linear (experimental)."""

    def __init__(self, W_nbits: int, group_size: int, in_features: int = None,
                 out_features: int = None, input_dtype: DType = DType.BF16,
                 output_dtype: DType = DType.BF16):
        if W_nbits not in _PLANES:
            raise NotImplementedError("OddBitLinear supports W3 and W5 only.")
        self.W_nbits = W_nbits
        self.low_bits, self.high_bits = _PLANES[W_nbits]
        self.group_size = group_size
        self.in_features = in_features
        self.out_features = out_features
        self.input_dtype = input_dtype
        self.output_dtype = output_dtype
        self.W_lo = self.W_hi = self.scales = self.zeros = self.bias = None

    def pack(self, W_q, scales, zeros, bias=None):
        """W_q: (N, K) uint8 codes in [0, 2^W_nbits)."""
        W_q = jnp.asarray(W_q, jnp.uint8)
        if self.out_features is None:
            self.out_features, self.in_features = W_q.shape
        lo = W_q & ((1 << self.low_bits) - 1)
        hi = W_q >> self.low_bits
        self.W_lo, self.elems_lo = pack_weights_over_cols(
            lo, self.low_bits, 32, transpose=True)
        self.W_hi, self.elems_hi = pack_weights_over_cols(
            hi, self.high_bits, 32, transpose=True)
        self.scales = jnp.asarray(scales).reshape(self.out_features, -1).T
        self.zeros = jnp.asarray(zeros).reshape(self.out_features, -1).T
        self.bias = None if bias is None else jnp.asarray(bias)
        return self

    def __call__(self, x):
        K, N = self.in_features, self.out_features
        # packed arrays are (K // elems, N); unpack in (N, K) orientation
        lo = unpack_over_cols(self.W_lo.T, self.low_bits, K)
        hi = unpack_over_cols(self.W_hi.T, self.high_bits, K)
        b = (hi.astype(jnp.int32) << self.low_bits) | lo.astype(jnp.int32)
        gs = self.group_size
        G = K // gs
        bg = b.reshape(N, G, gs).astype(jnp.float32)
        s = self.scales.T.reshape(N, G, 1).astype(jnp.float32)
        z = self.zeros.T.reshape(N, G, 1).astype(jnp.float32)
        W = ((bg - z) * s).reshape(N, K)
        cj = to_jax_dtype(self.input_dtype)
        out = jnp.dot(x.astype(cj), W.T.astype(cj),
                      preferred_element_type=jnp.float32)
        out = out.astype(to_jax_dtype(self.output_dtype))
        return out + self.bias if self.bias is not None else out

    forward = __call__


class _A16Wodd:
    W_nbits = None

    def __init__(self, device=None, dtype=None, group_size=128):
        self.group_size = group_size
        self.dtype = dtype

    def from_weights(self, W_q, scales, zeros, bias=None):
        N, K = np.asarray(W_q).shape
        layer = OddBitLinear(self.W_nbits, self.group_size, K, N)
        return layer.pack(W_q, scales, zeros, bias)


class A16W3(_A16Wodd):
    W_nbits = 3


class A16W5(_A16Wodd):
    W_nbits = 5
