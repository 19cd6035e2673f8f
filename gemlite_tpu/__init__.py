# SPDX-License-Identifier: Apache-2.0
"""gemlite-tpu: TPU-native low-bit fused dequantize+matmul framework.

A ground-up JAX/Pallas re-design with the capability matrix of the reference
GemLite library (Triton/CUDA): W1/W2/W4/W8 packed weights, FP8/INT8 dynamic
activation quantization, MXFP/NVFP4 microscaling formats, integration
processors, autotune config caching — plus what the reference lacks:
first-class tensor/data-parallel sharding over TPU meshes.
"""

from .dtypes import DType, is_mx_dtype
from .bitpack import (
    pack_weights_over_cols,
    pack_weights_over_rows,
    unpack_over_cols,
    unpack_over_rows,
)
from .core import (
    GemLiteLinear,
    GemLiteLinearTPU,
    GemLiteLinearTriton,
    GEMLITE_ACC_DTYPE,
    forward_functional,
    get_matmul_type,
    set_acc_dtype,
    set_mx_x2,
    set_packing_bitwidth,
    GEMLITE_MATMUL_TYPES,
)
from .utils import set_autotune_setting
from .config import (
    set_autotune,
    set_kernel_caching,
    cache_config,
    config_lookup_stats,
    load_config,
    reset_config,
)
# class-level statics, as the reference exposes them (core.py:559-627:
# GemLiteLinear.cache_config / load_config / reset_config)
GemLiteLinear.cache_config = staticmethod(cache_config)
GemLiteLinear.load_config = staticmethod(load_config)
GemLiteLinear.reset_config = staticmethod(reset_config)

from . import ops as _ops_registration  # wires the kernel registry
from .ops import dispatch as _dispatch  # noqa: F401
from . import helper
from .autotune import autotune_layer, autotune_shapes
from .checkpoint import save_model, load_model

# The shipped per-chip autotune table is loaded lazily on first kernel
# dispatch (config.ensure_default_config) — importing gemlite_tpu must not
# force-initialize the jax backend (jax.devices()) as a side effect.

__version__ = "0.1.0"
