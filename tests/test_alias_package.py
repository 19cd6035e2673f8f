# SPDX-License-Identifier: Apache-2.0
"""Drop-in import parity with the reference package name.

The reference exports these exact names from ``gemlite``
(reference gemlite/__init__.py); code written against them must run
unchanged on the TPU framework via the ``gemlite`` alias package.
"""

import numpy as np


def test_reference_toplevel_imports():
    from gemlite import (  # noqa: F401
        DType,
        GEMLITE_ACC_DTYPE,
        GemLiteLinear,
        GemLiteLinearTriton,
        cache_config,
        forward_functional,
        load_config,
        reset_config,
        set_acc_dtype,
        set_autotune,
        set_autotune_setting,
        set_kernel_caching,
        set_packing_bitwidth,
    )
    import gemlite

    assert gemlite.GemLiteLinearTriton is gemlite.GemLiteLinear
    # the class-level config statics the reference exposes
    assert callable(gemlite.GemLiteLinear.cache_config)
    assert callable(gemlite.GemLiteLinear.load_config)
    assert callable(gemlite.GemLiteLinear.reset_config)


def test_reference_submodule_imports():
    import sys

    import gemlite.core  # noqa: F401
    import gemlite.helper
    import gemlite.serving          # statement-form import of a lazy module
    import gemlite
    import gemlite_tpu

    # the alias module itself must survive (not be replaced by gemlite_tpu)
    assert sys.modules["gemlite"] is gemlite
    assert gemlite.__name__ == "gemlite"
    # submodules are the SAME objects under both names (identity holds)
    assert gemlite.helper is gemlite_tpu.helper
    assert gemlite.serving is gemlite_tpu.serving
    assert gemlite.models is gemlite_tpu.models
    from gemlite.helper import A16W4_HQQ_INT, A8W8_INT8_dynamic  # noqa: F401
    from gemlite.serving import ContinuousBatchingEngine  # noqa: F401
    # PEP 562: missing attributes raise AttributeError (hasattr stays sane)
    assert not hasattr(gemlite, "definitely_not_a_module")


def test_alias_layer_forward():
    import jax.numpy as jnp
    from gemlite import DType, GemLiteLinear

    rng = np.random.default_rng(0)
    N, K, gs = 256, 512, 128
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = np.full((G, 1), 2.0**-10, np.float32)
    zeros = rng.integers(0, 16, size=(G, 1)).astype(np.float32)
    layer = GemLiteLinear(4, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)
    x = jnp.asarray(rng.normal(size=(2, K)) * 0.1, jnp.bfloat16)
    y = layer(x)
    W_deq = ((W_q.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    want = np.asarray(x, np.float32) @ W_deq.T
    err = float(np.mean(np.abs(np.asarray(y, np.float32) - want)))
    assert err < 2e-2, err
