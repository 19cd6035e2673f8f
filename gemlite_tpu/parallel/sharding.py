# SPDX-License-Identifier: Apache-2.0
"""Tensor-parallel sharding of packed quantized linears over a TPU mesh.

The reference has no distributed machinery — model parallelism is delegated to
the serving engine, where each GPU holds a vanilla GemLite layer over its
weight shard (reference README.md:171-196). Here sharding is first-class:

  * Column-parallel: shard the output dim N. Packed words never straddle
    shards (packing is along K), so W_q:(Kp, N/tp), scales/zeros:(G, N/tp),
    bias:(N/tp). Output is N-sharded (Megatron up-proj convention) or
    all-gathered.
  * Row-parallel: shard the reduction dim K. Pack-time alignment rules:
    tp | G (group boundaries align with shards) and tp | Kp (packed words
    don't straddle). Output needs a psum (replicated) or reduce_scatter.

Forwards run under shard_map with the per-shard LayerMeta (local shapes) so
each device executes the same single-chip Pallas kernel on its shard, and XLA
overlaps the collective epilogue with the matmul across layers.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import GemLiteLinear, forward_functional

__all__ = ["make_mesh", "shard_layer", "ColumnParallelLinear",
           "RowParallelLinear", "check_shard_alignment"]


def make_mesh(axes: dict, devices=None) -> Mesh:
    """Create a Mesh from {axis_name: size}; -1 infers the remaining factor.

    Example: make_mesh({'dp': 2, 'tp': 4}) on 8 devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    names, sizes = list(axes.keys()), list(axes.values())
    total = devices.size
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = total // known
    assert int(np.prod(sizes)) == total, f"mesh {sizes} != {total} devices"
    return Mesh(devices.reshape(sizes), tuple(names))


def check_shard_alignment(layer: GemLiteLinear, tp: int, mode: str):
    """Pack-time alignment rules so shards hold whole packed words and whole
    quantization groups."""
    meta = layer.meta
    if mode == "column":
        assert meta.out_features % tp == 0, \
            f"out_features {meta.out_features} not divisible by tp={tp}"
        assert meta.out_features // tp % 128 == 0, \
            f"column shard {meta.out_features // tp} must be a multiple of " \
            f"the TPU lane width (128)"
    elif mode == "row":
        Kp = layer.W_q.shape[0]
        assert Kp % tp == 0, f"packed K rows {Kp} not divisible by tp={tp}"
        K_shard = meta.in_features // tp
        gs = meta.group_size
        if 1 < gs < meta.in_features:
            assert K_shard % gs == 0, \
                f"K shard {K_shard} must be a multiple of group_size {gs}"
        if getattr(meta, "w_layout", 0):
            # folded layout: shards must contain whole fold units or the
            # per-shard unfold decodes permuted codes. The unit is NOT
            # always group_size: NVFP4 folds on pair-fused 32-blocks
            # (gs=16) and channel-wise layers on fixed 512-code units
            # (core._plane_fold_unit).
            try:
                F = layer._plane_fold_unit(32) or 512
            except Exception:
                F = 512
            assert K_shard % F == 0, \
                f"K shard {K_shard} must be a multiple of the {F}-code " \
                f"fold unit"
        if layer.scales is not None and layer.scales.ndim == 2 and layer.scales.shape[0] > 1:
            assert layer.scales.shape[0] % tp == 0, \
                "scales group rows must divide evenly across shards"
    else:
        raise ValueError(mode)


def _local_meta(meta, tp: int, mode: str):
    if mode == "column":
        return meta._replace(out_features=meta.out_features // tp)
    # row: local K; channel-wise group_size (== K) also shrinks
    gs = meta.group_size
    if gs >= meta.in_features:
        gs = meta.in_features // tp
    return meta._replace(in_features=meta.in_features // tp, group_size=gs)


class _ShardedLinearBase:
    """Common machinery: places arrays with NamedSharding, builds the
    shard_map-wrapped forward closed over the per-shard LayerMeta."""

    mode: str = None

    def __init__(self, layer: GemLiteLinear, mesh: Mesh, axis: str = "tp"):
        self.mesh = mesh
        self.axis = axis
        self.tp = mesh.shape[axis]
        check_shard_alignment(layer, self.tp, self.mode)
        self.meta = layer.meta
        self.local_meta = _local_meta(self.meta, self.tp, self.mode)

        wspec, sspec, zspec, bspec = self._specs(layer)
        put = lambda a, s: (jax.device_put(a, NamedSharding(mesh, s))
                            if a is not None else None)
        self.W_q = put(layer.W_q, wspec)
        self.scales = put(layer.scales, sspec)
        z = layer.zeros
        self.zeros = put(z, P() if (z is not None and z.ndim == 0) else zspec)
        self.bias = put(layer.bias, bspec)

    # -- subclass hooks ----------------------------------------------------
    def _specs(self, layer):
        raise NotImplementedError

    def __call__(self, x):
        raise NotImplementedError


class ColumnParallelLinear(_ShardedLinearBase):
    """Shard N (output features). x replicated over the tp axis; output
    N-sharded (gather_output=False) or all-gathered."""

    mode = "column"

    def __init__(self, layer, mesh, axis="tp", gather_output=True):
        super().__init__(layer, mesh, axis)
        self.gather_output = gather_output
        a = self.axis
        lm = self.local_meta
        zspec = (P() if (self.zeros is None or self.zeros.ndim == 0)
                 else P(None, a))

        def fwd(x, W_q, scales, zeros, bias):
            return forward_functional(x, bias, [W_q, scales, zeros], lm)

        self._fwd = shard_map(
            fwd, mesh=self.mesh,
            in_specs=(P(), P(None, a), P(None, a), zspec, P(a)),
            out_specs=P(None, a),
            check_vma=False,
        )

    def _specs(self, layer):
        a = self.axis
        return P(None, a), P(None, a), P(None, a), P(a)

    def __call__(self, x):
        orig_shape = x.shape
        y = self._fwd(x.reshape(-1, x.shape[-1]), self.W_q, self.scales,
                      self.zeros, self.bias)
        y = y.reshape(orig_shape[:-1] + (self.meta.out_features,))
        if self.gather_output:
            y = jax.lax.with_sharding_constraint(
                y, NamedSharding(self.mesh, P()))
        return y


class RowParallelLinear(_ShardedLinearBase):
    """Shard K (reduction dim). x K-sharded (or auto-split from replicated);
    output psum-reduced (replicated) or reduce-scattered over N."""

    mode = "row"

    def __init__(self, layer, mesh, axis="tp", reduce_output: str = "psum"):
        assert reduce_output in ("psum", "scatter")
        super().__init__(layer, mesh, axis)
        self.reduce_output = reduce_output
        a = self.axis
        lm = self.local_meta
        sspec = self._meta_spec(self.scales)
        zspec = self._meta_spec(self.zeros)

        def fwd(x, W_q, scales, zeros):
            y = forward_functional(x, None, [W_q, scales, zeros], lm)
            if reduce_output == "psum":
                return jax.lax.psum(y, a)
            return jax.lax.psum_scatter(y, a, scatter_dimension=y.ndim - 1,
                                        tiled=True)

        self._fwd = shard_map(
            fwd, mesh=self.mesh,
            in_specs=(P(None, a), P(a, None), sspec, zspec),
            out_specs=P() if reduce_output == "psum" else P(None, a),
            check_vma=False,
        )

    def _meta_spec(self, t):
        """Grouped (G>1) metadata splits over K shards; channel-wise (1, N)
        metadata is replicated — scaling commutes with the psum."""
        if t is None or t.ndim == 0 or t.shape[0] == 1:
            return P()
        return P(self.axis, None)

    def _specs(self, layer):
        a = self.axis

        def mspec(t):
            if t is None or getattr(t, "ndim", 0) == 0 or t.shape[0] == 1:
                return P()
            return P(a, None)

        return P(a, None), mspec(layer.scales), mspec(layer.zeros), P()

    def __call__(self, x):
        orig_shape = x.shape
        y = self._fwd(x.reshape(-1, x.shape[-1]), self.W_q, self.scales, self.zeros)
        if self.bias is not None:
            y = y + self.bias
        return y.reshape(orig_shape[:-1] + (self.meta.out_features,))


def shard_layer(layer: GemLiteLinear, mesh: Mesh, axis: str = "tp",
                mode: str = "column", **kw):
    """Wrap a packed GemLiteLinear as a tensor-parallel layer."""
    cls = ColumnParallelLinear if mode == "column" else RowParallelLinear
    return cls(layer, mesh, axis, **kw)
