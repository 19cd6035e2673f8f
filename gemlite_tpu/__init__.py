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

__version__ = "0.1.0"
