# SPDX-License-Identifier: Apache-2.0
"""Autotuner: candidate pruning, cache store/lookup, dispatch pickup.

The benchmark-sweep path needs real hardware timing to be meaningful; on CPU
(interpret mode) we only validate that the search runs end-to-end, stores a
config under the reference-compatible signature, and that dispatch then uses
it (reference core.py:74-83, 559-627).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu import config as cfg_mod
from gemlite_tpu.autotune import _candidate_grid, _vmem_ok, autotune_layer
from gemlite_tpu.config import KernelConfig, config_signature, lookup_config
from gemlite_tpu.ops.dispatch import autotune_type_id
from gemlite_tpu.utils import m_bucket


def _make_layer(N=256, K=512, W_nbits=4, gs=64):
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
    G = N * K // gs
    scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2**-8).astype(np.float32)
    zeros = rng.integers(0, 2**W_nbits, size=(G, 1)).astype(np.float32)
    return GemLiteLinear(W_nbits, gs, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)


def test_candidate_grid_respects_divisibility():
    for cfg in _candidate_grid("max", 1, 384, 768, 64):
        assert 384 % cfg.block_n == 0 and 768 % cfg.block_k == 0
        assert cfg.block_m == 8  # M=1 decode


def test_vmem_pruning():
    layer = _make_layer()
    meta = layer.meta
    assert _vmem_ok(meta, KernelConfig(8, 256, 512))
    huge = KernelConfig(64, 65536, 65536)
    meta_huge = meta._replace(in_features=65536, out_features=65536)
    assert not _vmem_ok(meta_huge, huge)


def test_autotune_stores_and_dispatch_uses(monkeypatch):
    cfg_mod.reset_config()
    layer = _make_layer()
    # shrink the sweep so interpret-mode timing stays fast
    monkeypatch.setattr("gemlite_tpu.autotune._candidate_grid",
                        lambda eff, M, N, K, gs: [KernelConfig(8, 256, 512)])
    monkeypatch.setattr("gemlite_tpu.autotune._bench_call",
                        lambda fn, x, **kw: 1e-6)
    results = autotune_layer(layer, batch_sizes=(1,), effort="fast")
    assert results, "no config stored"
    sig = config_signature(m_bucket.get_closest_m(1), 256, 512, 64,
                           8, autotune_type_id(layer.meta))
    stored = lookup_config("GEMV_REVSPLITK", sig)
    assert stored == KernelConfig(8, 256, 512)

    # forward still numerically correct with the cached config in play
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 512)) * 0.2, jnp.bfloat16)
    y = layer(x)
    assert y.shape == (1, 256)
    cfg_mod.reset_config()


def test_fallback_route_table_entry(monkeypatch):
    """A tuned route='fallback' entry sends mid-M prefill through the
    two-pass dense path; a real fused entry at giant M sends it through the
    kernel — both numerically correct (the giant-M kernel-vs-fallback
    decision is measured, not hardcoded)."""
    import jax

    cfg_mod.reset_config()
    layer = _make_layer()
    meta = layer.meta
    rng = np.random.default_rng(2)
    W_deq = np.asarray(jax.jit(
        lambda: __import__("gemlite_tpu.autograd", fromlist=["x"])
        .dequantize_full(layer.W_q, layer.scales, layer.zeros, meta,
                         dtype=jnp.float32))())

    M = 128
    sig = config_signature(m_bucket.get_closest_m(M), 256, 512, 64, 8,
                           autotune_type_id(meta))
    cfg_mod.store_config("GEMM", sig, KernelConfig(0, 0, 0, route="fallback"))
    x = jnp.asarray(rng.normal(size=(M, 512)) * 0.2, jnp.bfloat16)
    y = layer(x)
    want = np.asarray(x, np.float32) @ W_deq
    err = np.mean(np.abs(np.asarray(y, np.float32) - want))
    assert err < 2e-2, err
    cfg_mod.reset_config()

    # round-trip: the route survives JSON serialization
    cfg_mod.store_config("GEMM", "s", KernelConfig(0, 0, 0, route="fallback"))
    d = cfg_mod.GEMLITE_TPU_CONFIG_CACHE["GEMM"]["s"]
    assert KernelConfig.from_dict(d).route == "fallback"
    cfg_mod.reset_config()


def test_giant_m_tuned_kernel_entry(monkeypatch):
    """With a fused table entry at the giant-M bucket, dispatch uses the
    prefill kernel instead of the hardcoded dense fallback."""
    import gemlite_tpu.ops.dispatch as dispatch_mod
    import gemlite_tpu.ops.pallas_prefill as pp

    cfg_mod.reset_config()
    layer = _make_layer()
    meta = layer.meta
    M = 4096
    sig = config_signature(m_bucket.get_closest_m(M), 256, 512, 64, 8,
                           autotune_type_id(meta))
    cfg_mod.store_config("GEMM", sig, KernelConfig(512, 256, 512))

    called = {}
    orig = pp.pallas_prefill_matmul

    def spy(*a, **kw):
        called["hit"] = True
        return orig(*a, **kw)
    monkeypatch.setattr(dispatch_mod, "pallas_prefill_matmul", spy)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(M, 512)) * 0.2, jnp.bfloat16)
    y = layer(x)
    assert called.get("hit"), "tuned giant-M entry did not route to the kernel"
    assert y.shape == (M, 256)
    cfg_mod.reset_config()


def test_cache_config_roundtrip(tmp_path):
    cfg_mod.reset_config()
    cfg_mod.store_config("GEMM", "sig1", KernelConfig(64, 512, 1024))
    path = str(tmp_path / "cfg.json")
    cfg_mod.cache_config(path)
    cfg_mod.reset_config()
    assert lookup_config("GEMM", "sig1") is None
    assert cfg_mod.load_config(path)
    assert lookup_config("GEMM", "sig1") == KernelConfig(64, 512, 1024)
    cfg_mod.reset_config()


def test_shipped_tables_chip_aware():
    """The three shipped per-chip tables load, cover every kernel family,
    and are MATERIALLY different per chip (v5p/v6e are chip-aware
    derivations of the measured v5e table, not clones)."""
    import json
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gemlite_tpu", "configs")
    tables = {}
    for tag in ("v5_lite", "v5p", "v6_lite"):
        with open(os.path.join(root, f"{tag}.json")) as f:
            tables[tag] = json.load(f)
    fams = ["GEMV", "GEMV_REVSPLITK", "GEMV_SPLITK", "GEMM_SPLITK", "GEMM"]
    for tag, t in tables.items():
        for fam in fams:
            assert t.get(fam), f"{tag}: family {fam} has no entries"
    # derived tables document their method and differ from the source AND
    # from each other
    strip = lambda t: {k: v for k, v in t.items() if not k.startswith("__")}
    for tag in ("v5p", "v6_lite"):
        assert "method" in tables[tag].get("__metadata__", {}), tag
        assert strip(tables[tag]) != strip(tables["v5_lite"]), tag
    assert strip(tables["v5p"]) != strip(tables["v6_lite"])

    # every entry (incl. the scaled ones) parses as a valid KernelConfig
    from gemlite_tpu.config import KernelConfig
    for tag, t in tables.items():
        for fam, entries in strip(t).items():
            for sig, d in entries.items():
                c = KernelConfig.from_dict(d)
                assert c.route == "fallback" or c.block_n > 0, (tag, fam, sig)


def test_loader_ignores_metadata_key():
    """load_config merges tables with a __metadata__ key without treating it
    as a kernel family."""
    import json
    from gemlite_tpu import config as C
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.json")
        with open(p, "w") as f:
            json.dump({"__metadata__": {"method": "x"},
                       "GEMM": {"(1, 2, 3, 4, 5, 6)": {"block_m": 8,
                                                       "block_n": 128,
                                                       "block_k": 128}}}, f)
        saved = dict(C.GEMLITE_TPU_CONFIG_CACHE)
        try:
            assert C.load_config(p, print_error=False)
            assert C.lookup_config("GEMM", "(1, 2, 3, 4, 5, 6)") is not None
            assert C.lookup_config("__metadata__", "method") is None
        finally:
            C.GEMLITE_TPU_CONFIG_CACHE.clear()
            C.GEMLITE_TPU_CONFIG_CACHE.update(saved)
