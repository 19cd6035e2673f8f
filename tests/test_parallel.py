"""Tensor-parallel sharding tests on the 8-virtual-device CPU mesh: sharded
forwards must match the single-device layer exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gemlite_tpu  # noqa: F401
from gemlite_tpu.core import GemLiteLinear
from gemlite_tpu.dtypes import DType
from gemlite_tpu.parallel import (
    make_mesh, shard_layer, ColumnParallelLinear, RowParallelLinear,
    check_shard_alignment,
)

RNG = np.random.default_rng(5)
N, K, GS = 1024, 2048, 128
TP = 4


@pytest.fixture(scope="module")
def layer():
    W_q = RNG.integers(0, 16, size=(N, K)).astype(np.uint8)
    scales = np.full((N * K // GS, 1), 2.0**-10, np.float32)
    zeros = RNG.integers(0, 16, size=(N * K // GS, 1)).astype(np.float32)
    return GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(W_q, scales, zeros)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= TP, "tests need the 8-device CPU mesh"
    return make_mesh({"dp": -1, "tp": TP})


def _x(m):
    return jnp.asarray(RNG.normal(size=(m, K)) * 0.1, jnp.bfloat16)


def _close(a, b, tol=1e-6):
    return float(jnp.mean(jnp.abs(jnp.asarray(a, jnp.float32) -
                                  jnp.asarray(b, jnp.float32)))) < tol


def test_column_parallel(layer, mesh):
    col = ColumnParallelLinear(layer, mesh, "tp", gather_output=True)
    x = _x(4)
    assert _close(col(x), layer(x))
    # weights really are sharded over tp
    assert col.W_q.sharding.spec == jax.sharding.PartitionSpec(None, "tp")


def test_column_parallel_sharded_output(layer, mesh):
    col = ColumnParallelLinear(layer, mesh, "tp", gather_output=False)
    x = _x(4)
    y = col(x)
    assert y.shape == (4, N)
    assert _close(y, layer(x))


def test_row_parallel_psum(layer, mesh):
    row = RowParallelLinear(layer, mesh, "tp", reduce_output="psum")
    x = _x(4)
    assert _close(row(x), layer(x), tol=5e-4)  # psum reorders the K reduction


def test_row_parallel_scatter(layer, mesh):
    row = RowParallelLinear(layer, mesh, "tp", reduce_output="scatter")
    x = _x(4)
    y = row(x)
    assert y.shape == (4, N)
    assert _close(y, layer(x), tol=5e-4)


def test_row_parallel_channelwise(mesh):
    """Channel-wise scales (replicated) commute with the psum."""
    W8 = RNG.integers(-100, 100, size=(N, K)).astype(np.int8)
    w_scales = np.abs(RNG.normal(size=(N, 1))).astype(np.float32) * 1e-3
    layer = GemLiteLinear(8, K, K, N, DType.BF16, DType.BF16).pack(
        jnp.asarray(W8), w_scales, None)
    row = RowParallelLinear(layer, mesh, "tp")
    x = _x(2)
    assert _close(row(x), layer(x), tol=5e-4)


def test_megatron_mlp_pattern(layer, mesh):
    """column(gather=False) -> elementwise -> row(psum): one all-reduce total,
    like a Megatron MLP block."""
    col = ColumnParallelLinear(layer, mesh, "tp", gather_output=False)
    # build a row layer with transposed dims (N -> K direction)
    W_q2 = RNG.integers(0, 16, size=(K, N)).astype(np.uint8)
    scales2 = np.full((K * N // GS, 1), 2.0**-10, np.float32)
    zeros2 = RNG.integers(0, 16, size=(K * N // GS, 1)).astype(np.float32)
    layer2 = GemLiteLinear(4, GS, N, K, DType.BF16, DType.BF16).pack(W_q2, scales2, zeros2)
    row = RowParallelLinear(layer2, mesh, "tp")

    x = _x(4)
    h = jax.nn.gelu(col(x).astype(jnp.float32)).astype(jnp.bfloat16)
    y = row(h)
    h_ref = jax.nn.gelu(layer(x).astype(jnp.float32)).astype(jnp.bfloat16)
    y_ref = layer2(h_ref)
    assert _close(y, y_ref, tol=5e-4)


def test_alignment_checks(layer, mesh):
    with pytest.raises(AssertionError):
        check_shard_alignment(layer, 3, "column")  # 1024 % 3 != 0


def test_jit_composes(layer, mesh):
    col = ColumnParallelLinear(layer, mesh, "tp", gather_output=True)
    f = jax.jit(lambda x: col(x) * 2.0)
    x = _x(4)
    assert _close(f(x), layer(x).astype(jnp.float32) * 2.0, tol=1e-5)
