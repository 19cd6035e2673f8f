# SPDX-License-Identifier: Apache-2.0
"""Layer API + functional dispatch.

``GemLiteLinear`` is the product surface: a quantized linear layer holding
packed weights + group metadata as jnp arrays and a 12-int metadata vector
(bit-compatible with the reference layout, core.py:525-538) as static config.

Unlike the reference torch.nn.Module, the layer is a registered JAX pytree:
arrays are leaves, all mode/shape metadata is static aux data — so a layer (or
a whole model of layers) can be passed straight through ``jax.jit`` /
``shard_map`` and each distinct configuration compiles exactly once.

Forward semantics follow reference core.py:128-195 (``forward_functional``):
optional dynamic activation quantization -> matmul-type selection by flattened
batch size -> fused dequant+matmul kernel -> bias add.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import (
    DType,
    FP8_INT8_DTYPES,
    JAX_TO_DTYPE,
    is_mx_dtype,
    to_jax_dtype,
)
from .bitpack import pack_weights_over_cols
from .quant import (
    scale_activations_per_token,
    scale_activations_mxfp8,
    scale_activations_mxfp4,
    scale_activations_nvfp4,
)


# ---------------------------------------------------------------------------
# Accumulator policy. TPU MXU natively accumulates fp32 (and int32 for int8
# operands); there is no consumer-GPU fp16-accumulation fast path to detect
# (reference core.py:39-54 probes GPU names — irrelevant here).
# ---------------------------------------------------------------------------
GEMLITE_ACC_DTYPE = {
    DType.FP16: DType.FP32,
    DType.BF16: DType.FP32,
    DType.FP32: DType.FP32,
    DType.FP8: DType.FP32,
    DType.FP8e4: DType.FP32,
    DType.FP8e4nuz: DType.FP32,
    DType.FP8e5: DType.FP32,
    DType.FP8e5nuz: DType.FP32,
    DType.INT8: DType.INT32,
    DType.MXFP16: DType.FP32,
    DType.MXBF16: DType.FP32,
    DType.MXFP8: DType.FP32,
    DType.MXFP4: DType.FP32,
    DType.NVFP4: DType.FP32,
}

# Kernel family names. Order defines the integer ids used by forward_manual —
# identical to the reference registry order (core.py:56-66) for API parity.
# On TPU all five are regime-tuned configurations of the fused Pallas kernel
# family (see ops/): the GEMV/SPLITK distinctions of the GPU implementation
# (warp shapes, atomics) do not transfer to a systolic-array machine.
GEMLITE_MATMUL_TYPES = ["GEMV", "GEMV_REVSPLITK", "GEMV_SPLITK", "GEMM_SPLITK", "GEMM"]
GEMLITE_MATMUL_TYPES_MAPPING = {name: i for i, name in enumerate(GEMLITE_MATMUL_TYPES)}

# matmul_type -> callable(x, layer-state..., meta: LayerMeta) -> (M, N).
# Populated by ops/dispatch at import; "_ref" is the jnp oracle fallback.
GEMLITE_KERNEL_REGISTRY = {}


def set_acc_dtype(dtype):
    """Override the fp16 accumulation dtype (API parity, reference core.py:94-97)."""
    assert dtype in (DType.FP16, DType.FP32), "acc dtype must be FP16 or FP32"
    GEMLITE_ACC_DTYPE[DType.FP16] = dtype


_MX_X2_ENABLED = True


def set_mx_x2(enable: bool):
    """Enable/disable the pack-time MXFP4 x2 re-encode (LayerMeta.mx_x2).
    Affects subsequent pack() calls only; packed layers keep their codec."""
    global _MX_X2_ENABLED
    _MX_X2_ENABLED = bool(enable)


def _fp8_codes_subnormal_free(codes_or_packed, e5m2: bool) -> bool:
    """True when no stored fp8 bit code is subnormal (E=0, M!=0). Works on
    the uint8 code matrix or on the packed int32 words (folding/packing only
    permutes code positions, never changes the byte set)."""
    b = np.asarray(codes_or_packed)
    if b.dtype != np.uint8:
        b = b.view(np.uint8)
    exp_m, man_m = (0x7C, 0x03) if e5m2 else (0x78, 0x07)
    return not bool((((b & exp_m) == 0) & ((b & man_m) != 0)).any())


def get_default_gemv(W_nbits: int, mx_dtype: bool = False) -> str:
    """M==1 kernel choice (reference core.py:100-105)."""
    if mx_dtype:
        return "GEMM_SPLITK"
    return "GEMV_REVSPLITK" if W_nbits < 8 else "GEMV_SPLITK"


def get_matmul_type(batch_size: int, W_nbits: int, mx_dtype: bool = False) -> str:
    """Kernel regime by flattened batch size (reference core.py:108-114)."""
    if batch_size > 64:
        return "GEMM"
    if batch_size > 1:
        return "GEMM_SPLITK"
    return get_default_gemv(W_nbits, mx_dtype)


class LayerMeta(NamedTuple):
    """Static (hashable) layer configuration.

    Fields [0:12] are the reference 12-int metadata vector in the exact
    reference order (core.py:525-538); the rest is TPU-side static info.
    """

    scaled_activations: int
    W_nbits: int
    group_size: int
    unpack_mask: int
    elements_per_sample: int
    input_dtype: int
    output_dtype: int
    acc_dtype: int
    meta_dtype: int
    channel_scale_mode: int
    W_group_mode: int
    data_contiguous: int
    # --- TPU-side statics (not part of the reference vector) ---
    in_features: int = 0
    out_features: int = 0
    zero_is_scalar: int = 0
    packing_bitwidth: int = 32
    # fp8-weight code flavor for MXFP8 layers: 0 = default (e4m3),
    # DType.FP8e5.value when the packed bytes are e5m2 bit patterns
    w_code_dtype: int = 0
    # packed-word code order: 0 = reference LSB-first (bit-compatible with
    # /root/reference/gemlite/bitpack.py), 1 = plane-folded (codes permuted at
    # pack time so the Pallas plane kernels contract in natural k order and x
    # needs NO per-call permutation; see bitpack.fold_codes_for_planes)
    w_layout: int = 0
    # 1 when a pack-time scan proved the stored fp8 bit codes contain NO
    # subnormals (E=0, M!=0): the plane kernels then use the 5-op normals-only
    # bit remap (exact on every stored code) instead of the renormalization
    # cascade — measured 2.6x faster at the A8W8-FP8 decode headline
    # (scripts/probe_fp8_trick.py / probe_fp8_rescue.py: the MXU and VPU both
    # flush bf16-subnormal INPUTS, so no in-register rescue exists)
    fp8_nosub: int = 0
    # 1 when a pack-time scan proved every e8m0 block-scale exponent of an
    # MXFP4 layer sits in a range where (fp4_value * 2^(E-127)) is an exact
    # bf16 NORMAL: the decode kernel then folds the block scale into the
    # planes with one broadcast multiply and contracts ONE flat (bm,bk)x
    # (bk,bn) MXU dot instead of bk/32 batched 32-deep group dots
    mx_flat: int = 0
    # 1 when an MXFP4 layer's packed nibbles were pack-time re-encoded to the
    # x2 codebook (quant.fp4x2_remap_packed: codes 0<->1 swapped, e8m0 scale
    # exponents pre-decremented): every nonzero code then decodes as the
    # bf16 NORMAL (1+m/2)*2^e via a single field insert (_fp4x2_planes,
    # 13 VPU ops/pair vs the 19-op subnormal-aware _fp4_planes) — the fp4
    # plane build is the whole MXFP4 decode cost at M=1
    mx_x2: int = 0

    @property
    def meta_args(self):
        return list(self[:12])


def forward_functional(x, bias, tensor_args, meta: LayerMeta, matmul_type: int = -1):
    """Pure functional fused forward (jit-traceable; all shapes/modes static).

    Mirrors reference core.py:128-195: dynamic activation quantization by
    input dtype + channel_scale_mode routing, then matmul-type selection by the
    flattened batch size (a static shape under jit), then the kernel call.
    """
    W_q, scales, zeros = tensor_args
    out_features = meta.out_features
    orig_shape = x.shape
    batch_size = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    out_shape = x.shape[:-1] + (out_features,)

    input_dtype = DType(meta.input_dtype)
    scales_x = None
    if meta.scaled_activations:
        csm = meta.channel_scale_mode
        if input_dtype in FP8_INT8_DTYPES:
            x, scales_x = scale_activations_per_token(x, to_jax_dtype(input_dtype))
        elif input_dtype == DType.MXFP8 and csm == 2:
            x, scales_x = scale_activations_per_token(x, jnp.float8_e4m3fn)
        elif input_dtype in (DType.MXFP8, DType.MXFP4, DType.NVFP4) and csm == 4:
            # micro-scaled activations: handled by the dispatch layer — the
            # prefill regime streams fp8 codes + e8m0-derived group scales
            # into the kernel (ops/dispatch.py); every other regime falls
            # back to exact bf16 fake-quant there (numerically identical)
            pass

    x = x.reshape(-1, x.shape[-1])

    if matmul_type >= 0:
        matmul_type_str = GEMLITE_MATMUL_TYPES[matmul_type]
    else:
        matmul_type_str = get_matmul_type(batch_size, meta.W_nbits, is_mx_dtype(input_dtype))

    kernel = GEMLITE_KERNEL_REGISTRY.get(matmul_type_str, GEMLITE_KERNEL_REGISTRY["_ref"])
    out = kernel(x, W_q, scales, zeros, scales_x, meta).reshape(out_shape)

    if bias is not None:
        out = out + bias
    return out


@jax.tree_util.register_pytree_node_class
class GemLiteLinear:
    """Quantized linear layer. ``pack()`` once offline, then call like a function.

    Capability surface mirrors reference GemLiteLinearTriton (core.py:210-627):
    same supported bit-widths/dtypes, same pack() mode decision tree, same
    metadata vector; but functional/pytree-native instead of nn.Module.
    """

    SUPPORTED_BITS = [1, 2, 4, 8, 16, 32]
    SUPPORTED_DTYPES = [
        DType.FP16, DType.BF16, DType.FP32,
        DType.FP8, DType.FP8e4, DType.FP8e4nuz, DType.FP8e5, DType.FP8e5nuz,
        DType.INT8,
        DType.MXFP16, DType.MXBF16, DType.MXFP8, DType.MXFP4, DType.NVFP4,
    ]
    MIN_SIZE = 32
    PACKING_BITWIDTH = 32

    def __init__(
        self,
        W_nbits: int = 4,
        group_size: Optional[int] = 64,
        in_features: Optional[int] = None,
        out_features: Optional[int] = None,
        input_dtype: DType = DType.BF16,
        output_dtype: DType = DType.BF16,
        acc_dtype: Optional[DType] = None,
        scaled_activations: bool = False,
    ):
        if W_nbits not in self.SUPPORTED_BITS:
            raise NotImplementedError(f"Only {self.SUPPORTED_BITS} W_nbits are supported.")
        if input_dtype not in self.SUPPORTED_DTYPES:
            raise NotImplementedError(f"Unsupported input dtype: {input_dtype}")
        if in_features is not None and out_features is not None:
            bad_min = in_features % self.MIN_SIZE != 0
            bad_gs = (in_features % group_size != 0) if group_size is not None else False
            if bad_min or bad_gs:
                raise NotImplementedError(
                    f"Invalid input shapes {in_features}, {out_features}: in_features "
                    f"must be divisible by {self.MIN_SIZE} and by group_size."
                )
        if group_size is not None and group_size < 16:
            raise NotImplementedError("Only group_size >= 16 is supported.")

        group_size = 1 if group_size is None else group_size

        self.in_features = in_features
        self.out_features = out_features
        self.orig_shape = (out_features, in_features)
        self.W_nbits = W_nbits
        self.group_size = group_size
        self.unpack_mask = 2**W_nbits - 1
        self.elements_per_sample = None
        self.signature = (in_features, out_features, W_nbits, group_size)

        self.input_dtype = input_dtype
        self.output_dtype = output_dtype
        self.compute_dtype = to_jax_dtype(input_dtype)
        self.meta_dtype = input_dtype
        self.acc_dtype = GEMLITE_ACC_DTYPE[input_dtype] if acc_dtype is None else acc_dtype

        # float activations are never dynamically quantized (reference core.py:293-296)
        if self.compute_dtype in (jnp.float16, jnp.bfloat16, jnp.float32):
            self.scaled_activations = False
        else:
            self.scaled_activations = scaled_activations

        self.W_q = None
        self.scales = None
        self.zeros = None
        self.bias = None
        self.channel_scale_mode = 0
        self.W_group_mode = -1
        self.data_contiguous = True
        self.zero_is_scalar = False
        self.packing_bitwidth = None
        self.w_code_dtype = 0
        self.w_layout = 0
        self.fp8_nosub = 0
        self.mx_flat = 0
        self.mx_x2 = 0

    # ------------------------------------------------------------------
    # pack(): offline weight preparation + dequant-mode decision tree.
    # Semantics re-derived from reference core.py:336-519.
    # ------------------------------------------------------------------
    def pack(self, W_q, scales=None, zeros=None, bias=None, fma_mode: bool = True,
             contiguous: Optional[bool] = None, packing_bitwidth: Optional[int] = None):
        W_q = jnp.asarray(W_q)

        # INT8 activations cannot absorb floating-point zero-points
        if zeros is not None and self.input_dtype == DType.INT8:
            if isinstance(zeros, float) and zeros != int(zeros):
                raise ValueError("INT8 inputs are not compatible with floating-point zeros.")
            if hasattr(zeros, "dtype") and jnp.issubdtype(jnp.asarray(zeros).dtype, jnp.floating):
                zf = jnp.asarray(zeros)
                if bool(jnp.any(zf != jnp.round(zf))):
                    raise ValueError("INT8 inputs are not compatible with floating-point zeros.")

        if packing_bitwidth is None:
            packing_bitwidth = GemLiteLinear.PACKING_BITWIDTH
        self.requested_packing_bitwidth = packing_bitwidth
        if is_mx_dtype(self.input_dtype):
            # fp4 codes pack into int32 words (8/word) so the plane-unpack
            # kernels apply; fp8 weights stay as native fp8 (non-packed).
            # (The reference forces byte packing for tl.dot_scaled layouts,
            # core.py:364-365 — a Triton constraint that does not apply here.)
            packing_bitwidth = 32 if self.W_nbits == 4 else 8
        elif packing_bitwidth != 32:
            # TPU normalization: 8/16/64-bit packing requests store int32
            # words. The LSB-first layout makes this a pure container change
            # — the little-endian byte stream along K is IDENTICAL for every
            # word width (element j of word r is code k = r*elems + j at bit
            # (j % elems)*W_nbits), so re-labelling the container is lossless.
            # The reference's 8-bit packing recommendation (core.py:229,
            # README.md:214) is a GPU L2/LDG-width tradeoff with no TPU
            # analog; int32 words are what the plane kernels stream. The
            # requested width is kept in ``requested_packing_bitwidth``.
            packing_bitwidth = 32

        if self.out_features is None or self.in_features is None:
            self.out_features, self.in_features = W_q.shape
            self.orig_shape = (self.out_features, self.in_features)

        # --- weight storage -------------------------------------------------
        if self.W_nbits == 8 and W_q.dtype in (jnp.float8_e4m3fn,
                                               jnp.float8_e5m2):
            # fp8 weights (MXFP8 block-scaled AND plain A8W8-FP8 channel-wise
            # alike): store the fp8 BITS packed 4-per-int32 so the plane
            # kernels' exact fp8->bf16 bit remap applies (bytes stored are
            # identical to the fp8 values; only the container changes).
            # w_code_dtype marks the flavor — nonzero distinguishes fp8 bit
            # codes from packed INTEGER W8 codes at dispatch.
            self.w_code_dtype = (DType.FP8e5.value
                                 if W_q.dtype == jnp.float8_e5m2
                                 else DType.FP8e4.value)
            W_q = jax.lax.bitcast_convert_type(W_q, jnp.uint8)
            packing_bitwidth = 32
            self.fp8_nosub = int(_fp8_codes_subnormal_free(
                W_q, e5m2=(self.w_code_dtype == DType.FP8e5.value)))
        codes_2d = None
        if W_q.dtype == jnp.uint8:
            # packed low-bit path: (N, K) uint8 -> (K // elems, N) ints
            codes_2d = W_q.reshape(self.orig_shape)
            self.W_q, self.elements_per_sample = pack_weights_over_cols(
                codes_2d, self.W_nbits, packing_bitwidth, transpose=True
            )
            if contiguous is None:
                contiguous = not is_mx_dtype(self.input_dtype)
        elif W_q.dtype == jnp.int8 or jnp.issubdtype(W_q.dtype, jnp.floating):
            # non-packed 8/16/32-bit weights stored transposed (K, N)
            if W_q.dtype == jnp.float32:
                assert self.W_nbits == 32, "fp32 weights require W_nbits=32"
            elif W_q.dtype in (jnp.float16, jnp.bfloat16):
                assert self.W_nbits == 16, "fp16/bf16 weights require W_nbits=16"
            else:
                assert self.W_nbits == 8, "8-bit weights require W_nbits=8"
            self.W_q = W_q.T
            self.elements_per_sample = 1
            if contiguous is None:
                contiguous = False
        else:
            raise ValueError(f"Cannot pack W_q with dtype {W_q.dtype}")

        self.packing_bitwidth = packing_bitwidth
        self.bias = None if bias is None else jnp.asarray(bias)

        # --- dequant mode decision tree -------------------------------------
        self.W_group_mode = -1
        self.channel_scale_mode = 0

        if scales is None and zeros is None:
            # no-metadata case (fp16xfp16 / fp8xfp8 / int8xint8)
            self.scales = None
            self.zeros = None
            self.W_group_mode = 0
            self.channel_scale_mode = 2 if self.scaled_activations else 0

        if scales is not None:
            self.scales = jnp.asarray(scales).reshape(self.out_features, -1).T
        else:
            self.scales = None

        meta_is_channelwise = (
            False if self.scales is None else self.scales.size == self.out_features
        )

        if zeros is None:
            self.zeros = None
            if self.W_group_mode == -1:
                self.W_group_mode = 2 if self.scales is not None else 0
        else:
            if hasattr(zeros, "ndim") and jnp.asarray(zeros).ndim > 0:
                z = jnp.asarray(zeros)
                if fma_mode and not meta_is_channelwise:
                    # fold: W ~ W_q * s + (-z*s), fused as one fma in-kernel
                    zf = (-z.astype(jnp.float32) * jnp.asarray(scales).astype(jnp.float32))
                    self.zeros = zf.astype(z.dtype).reshape(self.out_features, -1).T
                    self.W_group_mode = 4
                else:
                    # W ~ (W_q - z) * s
                    self.zeros = z.reshape(self.out_features, -1).T
                    self.W_group_mode = 3
            else:
                # scalar integer zero-point
                self.zeros = int(zeros)
                self.W_group_mode = 3 if self.scales is not None else 1

        assert self.W_group_mode > -1, "Invalid scales/zeros settings."

        # post-accumulation channel scaling overrides
        if not self.scaled_activations and meta_is_channelwise:
            self.channel_scale_mode = 1
            self.W_group_mode = 1 if self.zeros is not None else 0
        if self.scaled_activations and not meta_is_channelwise:
            self.channel_scale_mode = 2
        if self.scaled_activations and meta_is_channelwise:
            self.channel_scale_mode = 3
            self.W_group_mode = 1 if self.zeros is not None else 0

        if self.channel_scale_mode in (1, 3):
            assert self.W_group_mode not in (3, 4), \
                "channel_scale_mode 1/3 is incompatible with W_group_mode 3/4."

        # normalize zeros representation
        self.zero_is_scalar = isinstance(self.zeros, int)
        if self.zero_is_scalar:
            self.zeros = jnp.asarray(self.zeros, dtype=jnp.int32)

        self.data_contiguous = bool(contiguous)

        # --- MX scale storage: e8m0 (as uint8 bits) / fp8-e4m3, mode 2 ------
        # The float8_e8m0fnu dtype is rejected by the TPU compiler, so e8m0
        # scales are stored as their exponent bits in uint8 throughout.
        if is_mx_dtype(self.input_dtype) and self.scales is None:
            raise ValueError(
                f"{self.input_dtype} layers require block scales: pack() "
                "expects the e8m0/fp8 scales produced by WeightQuantizerMXFP")
        if self.input_dtype in (DType.MXFP16, DType.MXBF16, DType.MXFP8, DType.MXFP4):
            from .quant import _f32_pow2_to_e8m0_bits
            if self.scales.dtype == jnp.uint8:
                pass  # already e8m0 bits
            elif self.scales.dtype == jnp.float8_e8m0fnu:
                self.scales = jax.lax.bitcast_convert_type(self.scales, jnp.uint8)
            else:
                self.scales = _f32_pow2_to_e8m0_bits(self.scales)
        if self.input_dtype == DType.NVFP4:
            self.scales = self.scales.astype(jnp.float8_e4m3fn)
        if is_mx_dtype(self.input_dtype):
            # NOTE: kept (G, N) — unlike the reference's extra transpose for
            # tl.dot_scaled (core.py:495); our kernels define the layout.
            self.W_group_mode = 2
            self.channel_scale_mode = 0
        # MXFP4 x2 re-encode (decode-kernel fast path, see LayerMeta.mx_x2):
        # remap the packed nibbles to the x2 codebook and pre-decrement the
        # e8m0 scale exponents (value' = 2v, scale' = s/2 — exact). Requires
        # every E >= 1 so E-1 stays a valid e8m0 exponent.
        self.mx_x2 = 0
        # guard mirrors the kernels' codec choice: any MX input dtype with
        # 4-bit weights and uint8 e8m0 scales is fp4-coded (NVFP4 is excluded
        # by its fp8-e4m3 scales)
        if (_MX_X2_ENABLED and is_mx_dtype(self.input_dtype)
                and self.W_nbits == 4 and self.scales is not None
                and self.scales.dtype == jnp.uint8
                and jnp.asarray(self.W_q).dtype == jnp.int32):
            e = np.asarray(self.scales)
            # E >= 2 so the decremented exponent stays >= 1: every e8m0
            # decoder (quant.e8m0_bits_to_f32 and the in-kernel
            # shift_left(srows, 23) bitcast) decodes exponent 0 as f32 0.0,
            # so a pre-decremented E' = 0 would silently zero the group.
            if e.size and int(e.min()) >= 2:
                # scales fold here; the nibble remap runs AFTER the plane
                # fold below (the fold repacks from the pre-remap codes_2d)
                self.scales = jnp.asarray(e - 1, dtype=jnp.uint8)
                self.mx_x2 = 1
        # MXFP4 flat-dot eligibility: every e8m0 exponent must keep
        # fp4_value * 2^(E-127) an exact NORMAL bf16 (fp4 min-normal-exp -1
        # and max 6 = 2^2.58: E in [16, 235] leaves > 100 octaves of slack
        # on either side of bf16's [-126, 127] range). Superseded at dispatch
        # by mx_x2 (the batched x2 build measured faster than the flat fold
        # on-chip), kept for non-x2 layers/checkpoints.
        self.mx_flat = 0
        if (not self.mx_x2
                and is_mx_dtype(self.input_dtype) and self.W_nbits == 4
                and self.scales is not None
                and self.scales.dtype == jnp.uint8):
            e = np.asarray(self.scales)
            if e.size and 16 <= int(e.min()) and int(e.max()) <= 235:
                self.mx_flat = 1
        self._upgrade_fp8_nosub()

        if self.scales is not None:
            self.meta_dtype = JAX_TO_DTYPE[jnp.dtype(self.scales.dtype)] \
                if jnp.dtype(self.scales.dtype) in JAX_TO_DTYPE else self.meta_dtype

        # --- plane-fold the packed codes (w_layout=1) when the fast Pallas
        # plane kernels can serve this layer: the in-kernel plane stacking then
        # contracts in natural k order and x ships unpermuted (the pack-time
        # replacement for the per-call permute_x_for_planes; see bitpack.py)
        self.w_layout = 0
        fold_gs = self._plane_fold_unit(packing_bitwidth)
        if fold_gs is not None and codes_2d is not None:
            from .bitpack import fold_codes_for_planes, fold_plane_count
            layout = 2 if self._w8_byte_planes() else 1
            n_planes = fold_plane_count(self.W_nbits, layout)
            self.W_q, _ = pack_weights_over_cols(
                fold_codes_for_planes(codes_2d, n_planes, fold_gs),
                self.W_nbits, packing_bitwidth, transpose=True)
            self.w_layout = layout

        if self.mx_x2:
            # per-nibble x2 re-encode, last so it survives the fold repack
            # (position-independent, commutes with any code permutation)
            from .quant import fp4x2_remap_packed
            self.W_q = fp4x2_remap_packed(self.W_q)

        return self

    def _w8_byte_planes(self) -> bool:
        """Integer-coded W8 layers fold on BYTE planes (w_layout=2): the
        decode/prefill kernels build 4 full-lane byte planes via the f32
        exponent trick (|0x4B000000 bitcast, -2^23) — measured 42.8 -> 26.8us
        at 4096^2 gs=K M=1 on v5e vs the bf16 nibble-pair build
        (scripts/probe_w8.py). fp8 bit codes and MX layers keep halfword
        planes (w_layout=1)."""
        return (self.W_nbits == 8 and not getattr(self, "w_code_dtype", 0)
                and not is_mx_dtype(self.input_dtype))

    def _plane_fold_unit(self, packing_bitwidth: int):
        """Fold unit F for w_layout=1, or None when the plane kernels cannot
        serve this layer (then the reference LSB-first layout is kept so the
        general kernel / oracle apply directly)."""
        K, N = self.in_features, self.out_features
        if packing_bitwidth != 32 or K is None or N is None:
            return None
        fp8_codes = bool(getattr(self, "w_code_dtype", 0))
        allowed_modes = (0, 1, 2, 3, 4) if fp8_codes else (1, 2, 3, 4)
        if self.W_group_mode not in allowed_modes or self.channel_scale_mode == 4:
            return None
        if self.W_nbits not in (1, 2, 4, 8):
            return None
        if self.input_dtype == DType.INT8:
            # INT8-activation layers keep the reference order: the exact
            # int8 decode kernel (ops/pallas_int8.py) reads natural bytes /
            # byte-planes, and the bf16 kernels still serve via the
            # layout-0 permute path
            return None
        if is_mx_dtype(self.input_dtype):
            # MXFP4/NVFP4 fp4 codes and MXFP8 fp8-bit codes take the plane
            # paths; NVFP4 (gs=16) folds on the pair-fused 32-element build
            if self.W_nbits not in (4, 8):
                return None
            F = 32 if self.input_dtype == DType.NVFP4 else self.group_size
        elif 1 < self.group_size < K:
            F = self.group_size
            if F > 512:
                return None  # fold unit must not exceed the kernel k-block
        else:
            F = 512  # channel-wise: fixed fold unit (= kernel group unit)
        from .bitpack import fold_plane_count
        n_planes = fold_plane_count(
            self.W_nbits, 2 if self._w8_byte_planes() else 1)
        if K % F or F % n_planes or (F // n_planes) % 8:
            return None
        if N % 128 or K % 128:
            return None
        return F

    def to_reference_layout(self):
        """Rewrite the packed weights back to the reference LSB-first order
        (w_layout=0) in place — for exporting reference-compatible
        checkpoints or driving the general kernel directly."""
        if not getattr(self, "w_layout", 0):
            return self
        from .bitpack import (fold_codes_for_planes, fold_plane_count,
                              unfold_codes_for_planes, unpack_over_rows)
        K = self.in_features
        n_planes = fold_plane_count(self.W_nbits, self.w_layout)
        fold_gs = self._plane_fold_unit(self.packing_bitwidth or 32)
        if fold_gs is None and self.channel_scale_mode == 4:
            # csm 4 is set POST-pack by the dynamic-MX processors
            # (mx.py A4W4_MXFP/NVFP/A8Wn post_scale=False); the stored
            # layout was folded when csm was still 0 — recompute with the
            # override masked so export matches what pack() actually did
            saved = self.channel_scale_mode
            try:
                self.channel_scale_mode = 0
                fold_gs = self._plane_fold_unit(self.packing_bitwidth or 32)
            finally:
                self.channel_scale_mode = saved
        if fold_gs is None:
            raise ValueError(
                "cannot derive the fold unit for this folded layer "
                "(post-pack metadata override?) — export is ambiguous")
        codes = unpack_over_rows(self.W_q, self.W_nbits, K).T  # (N, K)
        codes = unfold_codes_for_planes(codes, n_planes, fold_gs)
        self.W_q, _ = pack_weights_over_cols(
            codes, self.W_nbits, self.packing_bitwidth or 32, transpose=True)
        self.w_layout = 0
        return self

    # ------------------------------------------------------------------
    def get_tensor_args(self):
        return [self.W_q, self.scales, self.zeros]

    def get_meta_args(self):
        """The reference 12-int metadata vector (core.py:525-538)."""
        return list(self.meta[:12])

    @property
    def meta(self) -> LayerMeta:
        return LayerMeta(
            scaled_activations=int(self.scaled_activations),
            W_nbits=self.W_nbits,
            group_size=self.group_size,
            unpack_mask=self.unpack_mask,
            elements_per_sample=self.elements_per_sample,
            input_dtype=self.input_dtype.value,
            output_dtype=self.output_dtype.value,
            acc_dtype=self.acc_dtype.value,
            meta_dtype=self.meta_dtype.value,
            channel_scale_mode=self.channel_scale_mode,
            W_group_mode=self.W_group_mode,
            data_contiguous=int(self.data_contiguous),
            in_features=self.in_features,
            out_features=self.out_features,
            zero_is_scalar=int(self.zero_is_scalar),
            packing_bitwidth=self.packing_bitwidth or 32,
            w_code_dtype=getattr(self, "w_code_dtype", 0),
            w_layout=getattr(self, "w_layout", 0),
            fp8_nosub=getattr(self, "fp8_nosub", 0),
            mx_flat=getattr(self, "mx_flat", 0),
            mx_x2=getattr(self, "mx_x2", 0),
        )

    def forward_manual(self, x, matmul_type: str = "GEMM"):
        return forward_functional(
            x, self.bias, self.get_tensor_args(), self.meta,
            GEMLITE_MATMUL_TYPES_MAPPING[matmul_type],
        )

    def __call__(self, x):
        return forward_functional(x, self.bias, self.get_tensor_args(), self.meta)

    forward = __call__

    # ------------------------------------------------------------------
    # Serialization: arrays + metadata vector + orig_shape, like the
    # reference state_dict round-trip (core.py:301-333, 502-517).
    # ------------------------------------------------------------------
    def state_dict(self):
        sd = {
            "metadata": np.asarray(self.get_meta_args(), dtype=np.int32),
            "orig_shape": np.asarray([self.out_features, self.in_features], dtype=np.int32),
            "W_q": np.asarray(self.W_q),
        }
        if self.scales is not None:
            sd["scales"] = np.asarray(self.scales)
        if self.zeros is not None:
            sd["zeros"] = np.asarray(self.zeros)
        if self.bias is not None:
            sd["bias"] = np.asarray(self.bias)
        if getattr(self, "w_code_dtype", 0):
            sd["w_code_dtype"] = np.asarray(self.w_code_dtype, dtype=np.int32)
        if getattr(self, "w_layout", 0):
            sd["w_layout"] = np.asarray(self.w_layout, dtype=np.int32)
        if getattr(self, "fp8_nosub", 0):
            sd["fp8_nosub"] = np.asarray(self.fp8_nosub, dtype=np.int32)
        if getattr(self, "mx_flat", 0):
            sd["mx_flat"] = np.asarray(self.mx_flat, dtype=np.int32)
        if getattr(self, "mx_x2", 0):
            sd["mx_x2"] = np.asarray(self.mx_x2, dtype=np.int32)
        return sd

    def load_state_dict(self, state_dict):
        sd = dict(state_dict)
        meta = [int(v) for v in np.asarray(sd.pop("metadata"))]
        (scaled_activations, self.W_nbits, self.group_size, self.unpack_mask,
         self.elements_per_sample, input_dtype, output_dtype, acc_dtype,
         meta_dtype, self.channel_scale_mode, self.W_group_mode,
         data_contiguous) = meta

        self.scaled_activations = bool(scaled_activations)
        self.data_contiguous = bool(data_contiguous)
        self.input_dtype = DType(input_dtype)
        self.output_dtype = DType(output_dtype)
        self.acc_dtype = DType(acc_dtype)
        self.meta_dtype = DType(meta_dtype)
        self.compute_dtype = to_jax_dtype(self.input_dtype)

        self.out_features, self.in_features = (int(v) for v in np.asarray(sd.pop("orig_shape")))
        self.orig_shape = (self.out_features, self.in_features)

        self.W_q = jnp.asarray(sd.pop("W_q"))
        self.scales = jnp.asarray(sd["scales"]) if "scales" in sd else None
        zeros = sd.get("zeros")
        self.zeros = jnp.asarray(zeros) if zeros is not None else None
        self.zero_is_scalar = self.zeros is not None and self.zeros.ndim == 0
        self.bias = jnp.asarray(sd["bias"]) if "bias" in sd else None
        self.w_code_dtype = int(np.asarray(sd["w_code_dtype"])) if "w_code_dtype" in sd else 0
        # absent in reference-produced state dicts -> reference layout (0)
        self.w_layout = int(np.asarray(sd["w_layout"])) if "w_layout" in sd else 0
        if "fp8_nosub" in sd:
            self.fp8_nosub = int(np.asarray(sd["fp8_nosub"]))
        elif self.w_code_dtype:
            # older fp8 checkpoint without the flag: re-scan the packed bytes
            # (plane folding only permutes code positions, so the byte view of
            # the packed words is exactly the stored code set)
            self.fp8_nosub = int(_fp8_codes_subnormal_free(
                self.W_q, e5m2=(self.w_code_dtype == DType.FP8e5.value)))
        else:
            self.fp8_nosub = 0
        self.packing_bitwidth = 32
        if self.w_layout == 1 and self._w8_byte_planes():
            # pre-byte-plane checkpoint: integer W8 folded on halfword planes
            # (P=2); migrate once to the byte-plane fold (w_layout=2, P=4)
            # the current kernels read
            from .bitpack import (fold_codes_for_planes,
                                  unfold_codes_for_planes, unpack_over_rows)
            F = self._plane_fold_unit(32)
            if F is not None:
                codes = unpack_over_rows(
                    self.W_q, self.W_nbits, self.in_features).T
                codes = unfold_codes_for_planes(codes, 2, F)
                self.W_q, _ = pack_weights_over_cols(
                    fold_codes_for_planes(codes, 4, F), self.W_nbits, 32,
                    transpose=True)
                self.w_layout = 2
        if self.input_dtype in (DType.MXFP16, DType.MXBF16, DType.MXFP8, DType.MXFP4) \
           and self.scales is not None and self.scales.dtype != jnp.uint8:
            self.scales = jax.lax.bitcast_convert_type(self.scales, jnp.uint8)
        # x2-re-encoded checkpoints carry the flag; its absence means the
        # stored nibbles are standard fp4 codes (no re-scan possible)
        self.mx_x2 = int(np.asarray(sd["mx_x2"])) if "mx_x2" in sd else 0
        if "mx_flat" in sd:
            self.mx_flat = int(np.asarray(sd["mx_flat"]))
        else:
            # older MXFP4 checkpoint without the flag: re-scan the e8m0 range
            # (x2-re-encoded codes are not _fp4_planes-decodable: never flat)
            self.mx_flat = 0
            if (not self.mx_x2
                    and is_mx_dtype(self.input_dtype) and self.W_nbits == 4
                    and self.scales is not None
                    and self.scales.dtype == jnp.uint8):
                e = np.asarray(self.scales)
                if e.size and 16 <= int(e.min()) and int(e.max()) <= 235:
                    self.mx_flat = 1
        self._upgrade_fp8_nosub()
        return self

    def _upgrade_fp8_nosub(self):
        """Upgrade fp8_nosub 1 -> 2 when the layer's e8m0 block-scale
        exponents allow the prefill kernel's scaled-fold fast build: every
        E in [1, 254 - gap] keeps the biased decode 2^(E - 127 + gap) a
        finite f32/bf16 normal (E = 0 decodes to 0.0; E + gap = 255 would
        decode to inf). Value 2 implies 1 (decode kernels test truthiness)."""
        if (getattr(self, "fp8_nosub", 0) == 1 and self.W_group_mode == 2
                and self.scales is not None
                and self.scales.dtype == jnp.uint8):
            gap = 112 if self.w_code_dtype == DType.FP8e5.value else 120
            e = np.asarray(self.scales)
            if e.size and int(e.min()) >= 1 and int(e.max()) <= 254 - gap:
                self.fp8_nosub = 2

    def save(self, path: str):
        import json

        from .dtypes import npz_encode_array

        arrays, markers = {}, {}
        for k, v in self.state_dict().items():
            arrays[k], m = npz_encode_array(v)
            if m:   # ml_dtypes (bf16/fp8/e8m0) degrade to void in np.savez
                markers[k] = m
        if markers:
            arrays["__dtypes__"] = np.frombuffer(
                json.dumps(markers).encode(), dtype=np.uint8)
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str):
        import json

        from .dtypes import npz_decode_array

        with np.load(path, allow_pickle=False) as data:
            sd = {k: data[k] for k in data.files}
        markers = {}
        if "__dtypes__" in sd:
            markers = json.loads(bytes(sd.pop("__dtypes__")).decode())
        sd = {k: npz_decode_array(v, markers.get(k)) for k, v in sd.items()}
        layer = cls.__new__(cls)
        layer.bias = None
        layer.load_state_dict(sd)
        return layer

    # ------------------------------------------------------------------
    # pytree protocol: arrays are leaves, LayerMeta + bias flag is aux.
    # ------------------------------------------------------------------
    def tree_flatten(self):
        children = (self.W_q, self.scales, self.zeros, self.bias)
        return children, self.meta

    @classmethod
    def tree_unflatten(cls, meta: LayerMeta, children):
        layer = cls.__new__(cls)
        layer.W_q, layer.scales, layer.zeros, layer.bias = children
        layer.W_nbits = meta.W_nbits
        layer.group_size = meta.group_size
        layer.unpack_mask = meta.unpack_mask
        layer.elements_per_sample = meta.elements_per_sample
        layer.input_dtype = DType(meta.input_dtype)
        layer.output_dtype = DType(meta.output_dtype)
        layer.acc_dtype = DType(meta.acc_dtype)
        layer.meta_dtype = DType(meta.meta_dtype)
        layer.channel_scale_mode = meta.channel_scale_mode
        layer.W_group_mode = meta.W_group_mode
        layer.scaled_activations = bool(meta.scaled_activations)
        layer.data_contiguous = bool(meta.data_contiguous)
        layer.in_features = meta.in_features
        layer.out_features = meta.out_features
        layer.orig_shape = (meta.out_features, meta.in_features)
        layer.zero_is_scalar = bool(meta.zero_is_scalar)
        layer.packing_bitwidth = meta.packing_bitwidth
        layer.w_code_dtype = meta.w_code_dtype
        layer.w_layout = meta.w_layout
        layer.fp8_nosub = meta.fp8_nosub
        layer.mx_flat = meta.mx_flat
        layer.mx_x2 = getattr(meta, "mx_x2", 0)
        layer.compute_dtype = to_jax_dtype(layer.input_dtype)
        layer.signature = (layer.in_features, layer.out_features, layer.W_nbits, layer.group_size)
        return layer


GemLiteLinearTPU = GemLiteLinear  # explicit alias
# drop-in import-compatibility alias (the reference exports its layer as
# GemLiteLinearTriton == GemLiteLinear, reference core.py:631 + __init__.py)
GemLiteLinearTriton = GemLiteLinear


def set_packing_bitwidth(packing_bitwidth: int):
    GemLiteLinear.PACKING_BITWIDTH = packing_bitwidth
