# SPDX-License-Identifier: Apache-2.0
"""Experimental odd bit-width (W3/W5) quantized linears via dual-plane packing.

Mirrors the reference's experimental kernels (triton_kernels/experimental/
A16W3_gemm.py:212-231, A16W5_gemm.py) where an odd bit-width is stored as two
separately packed power-of-two planes: W3 = 1-bit plane + 2-bit plane,
W5 = 1-bit + 4-bit; the kernel reconstructs ``b = (b_hi << 1) | b_lo``
(A16W3_gemm.py:129-139) before the usual (b - z) * s dequant.

TPU design: both planes are packed with the standard LSB-first int32 engine
(bitpack.py) in the plane-FOLDED order (w_layout=1, bitpack.py) — the hi
plane on group_size units, the lo plane on fixed 128-code units — so the
fused Pallas kernels stream both planes and reconstruct the code in ONE bf16
fma per element: 2*(128+hi) + (128+lo) - 256 = 128 + code, which drops
straight into the raw-dot correction (decode) / dequant-cache build (prefill)
of the main kernels (ops/pallas_decode.py, ops/pallas_prefill.py). HBM
traffic is 3 (5) bits per weight — the point of odd-bit storage, which the
reference achieves with a fused Triton kernel and this port matches with a
fused Pallas path instead of an XLA dequant stub.

Like the reference, this is not wired into the core dispatch — it is an
API-parity capability with its own mini layer class (A16W3_gemm.py:180-248).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bitpack import (
    fold_codes_for_planes,
    pack_weights_over_cols,
    unpack_over_cols,
)
from ..core import LayerMeta
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
        self.fused = False

    # ------------------------------------------------------------------
    def _can_fuse(self) -> bool:
        K, N, gs = self.in_features, self.out_features, self.group_size
        P_hi = 16 // self.high_bits
        return (K % 128 == 0 and N % 128 == 0 and K % gs == 0
                and 1 < gs < K and gs <= 512
                and gs % P_hi == 0 and (gs // P_hi) % 8 == 0)

    def pack(self, W_q, scales, zeros, bias=None):
        """W_q: (N, K) uint8 codes in [0, 2^W_nbits)."""
        W_q = jnp.asarray(W_q, jnp.uint8)
        if self.out_features is None:
            self.out_features, self.in_features = W_q.shape
        lo = W_q & ((1 << self.low_bits) - 1)
        hi = W_q >> self.low_bits
        self.fused = self._can_fuse()
        if self.fused:
            # plane-folded order so the fused kernels contract in natural k:
            # hi on group_size units, lo on fixed 128-code units
            hi = fold_codes_for_planes(hi, 16 // self.high_bits, self.group_size)
            lo = fold_codes_for_planes(lo, 16, 128)
        self.W_lo, self.elems_lo = pack_weights_over_cols(
            lo, self.low_bits, 32, transpose=True)
        self.W_hi, self.elems_hi = pack_weights_over_cols(
            hi, self.high_bits, 32, transpose=True)
        self.scales = jnp.asarray(scales).reshape(self.out_features, -1).T
        self.zeros = jnp.asarray(zeros).reshape(self.out_features, -1).T
        from ..dtypes import to_jax_dtype
        self.bias = (None if bias is None else
                     jnp.asarray(bias, to_jax_dtype(self.output_dtype)))
        return self

    # ------------------------------------------------------------------
    @property
    def _hi_meta(self) -> LayerMeta:
        """Kernel-facing metadata describing the HIGH plane; the kernels
        reconstruct code = (hi << 1) | lo in the same offset domain."""
        return LayerMeta(
            scaled_activations=0,
            W_nbits=self.high_bits,
            group_size=self.group_size,
            unpack_mask=(1 << self.high_bits) - 1,
            elements_per_sample=32 // self.high_bits,
            input_dtype=self.input_dtype.value,
            output_dtype=self.output_dtype.value,
            acc_dtype=DType.FP32.value,
            meta_dtype=DType.FP32.value,
            channel_scale_mode=0,
            W_group_mode=3,                     # (code - z) * s
            data_contiguous=1,
            in_features=self.in_features,
            out_features=self.out_features,
            zero_is_scalar=0,
            packing_bitwidth=32,
            w_layout=1,
        )

    def __call__(self, x):
        squeeze = x.ndim == 1
        x2 = x.reshape(-1, x.shape[-1])
        if self.fused:
            out = self._forward_fused(x2)
        else:
            out = self._forward_xla(x2)
        if self.bias is not None:
            out = out + self.bias
        return out[0] if squeeze else out

    def _forward_fused(self, x):
        from ..ops.pallas_decode import (can_use_decode_kernel,
                                         pallas_decode_matmul,
                                         select_decode_config)
        from ..ops.pallas_prefill import (can_use_prefill_kernel,
                                          pallas_prefill_matmul,
                                          select_prefill_config)
        meta = self._hi_meta
        M = x.shape[0]
        N, K = self.out_features, self.in_features
        if M <= 64:
            cfg = select_decode_config(meta, M, N, K)
            if can_use_decode_kernel(meta, M, N, K, cfg):
                return pallas_decode_matmul(x, self.W_hi, self.scales,
                                            self.zeros, None, meta, cfg,
                                            W_lo=self.W_lo)
        cfg = select_prefill_config(meta, M, N, K)
        if can_use_prefill_kernel(meta, M, N, K, cfg):
            return pallas_prefill_matmul(x, self.W_hi, self.scales,
                                         self.zeros, None, meta, cfg,
                                         W_lo=self.W_lo)
        return self._forward_xla(x)

    def _forward_xla(self, x):
        """Unfused fallback (reference-order planes): XLA dequant + matmul."""
        K, N = self.in_features, self.out_features
        from ..bitpack import unfold_codes_for_planes
        # packed arrays are (K // elems, N); unpack in (N, K) orientation
        lo = unpack_over_cols(self.W_lo.T, self.low_bits, K)
        hi = unpack_over_cols(self.W_hi.T, self.high_bits, K)
        if self.fused:
            lo = unfold_codes_for_planes(lo, 16, 128)
            hi = unfold_codes_for_planes(hi, 16 // self.high_bits,
                                         self.group_size)
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
        return out.astype(to_jax_dtype(self.output_dtype))

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
