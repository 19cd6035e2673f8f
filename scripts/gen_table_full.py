# SPDX-License-Identifier: Apache-2.0
"""Generate the full shipped autotune table for this chip.

Sweeps the Llama projection shapes x {W4 gs128/gs64, W2, W8, W1, MXFP4,
NVFP4, MXFP8} x M buckets 1..4096 with the 'fast' candidate grids and
writes gemlite_tpu/configs/<tag>.json incrementally (safe to interrupt and
resume: already-cached signatures are skipped unless --retune).

The analogue of the reference's shipped per-GPU tables
(/root/reference/gemlite/core.py:634-654, configs/h100.json).

Usage: python scripts/gen_table_full.py [out.json] [--retune]
"""
import os
import sys
import logging
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.WARNING, format="%(message)s")

SHAPES = [(4096, 4096), (14336, 4096), (4096, 14336), (1024, 4096),
          (4096, 1024)]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import gemlite_tpu  # noqa: F401
    from gemlite_tpu.autotune import autotune_shapes
    from gemlite_tpu.dtypes import DType
    from gemlite_tpu import config as cfg
    from gemlite_tpu.config import ensure_default_config

    retune = "--retune" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kind = jax.devices()[0].device_kind.lower().replace(" ", "_")
    tag = kind.replace("tpu_", "")
    default_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "gemlite_tpu", "configs", f"{tag}.json")
    out = args[0] if args else default_out
    if os.path.dirname(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)

    # resume support: skip (shape, M, format) combos already in the file
    # (match on the (M_bucket, N, K, gs, elems) signature prefix)
    import json
    from gemlite_tpu.utils import m_bucket
    existing = set()
    if not retune and os.path.exists(out):
        try:
            with open(out) as f:
                for fam in json.load(f).values():
                    existing.update(fam.keys())
        except Exception:
            pass

    def tune_one(label, shape, W_nbits, gs, M, input_dtype=None):
        elems = {1: 32, 2: 16, 4: 8, 8: 4}[W_nbits]
        N, K = shape
        prefix = f"({m_bucket.get_closest_m(M)}, {N}, {K}, {gs}, {elems},"
        if any(s.startswith(prefix) for s in existing):
            return
        t0 = time.time()
        print(f"=== {label} {shape} M={M} ===", flush=True)
        try:
            autotune_shapes([shape], W_nbits=W_nbits, group_size=gs,
                            batch_sizes=(M,), effort="fast",
                            verbose=False, input_dtype=input_dtype)
        except Exception as e:
            print(f"  FAILED: {str(e)[:200]}", flush=True)
            return
        cfg.cache_config(out)
        n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
        print(f"  -> {n} entries ({time.time()-t0:.0f}s)", flush=True)

    # (label, shapes, W_nbits, gs, input_dtype) ordered by serving importance
    MLP = [(4096, 4096), (14336, 4096), (4096, 14336)]
    COMBOS = [
        ("W4 gs=128", SHAPES, 4, 128, None),
        ("W4 gs=64", SHAPES, 4, 64, None),
        ("W2 gs=128", MLP, 2, 128, None),
        ("W8 gs=128", MLP, 8, 128, None),
        ("W1 gs=128", [(4096, 4096)], 1, 128, None),
        ("MXFP4", MLP, 4, 32, DType.MXFP4),
        ("NVFP4", MLP, 4, 16, DType.NVFP4),
        ("MXFP8", MLP, 8, 32, DType.MXFP8),
    ]
    # breadth-first: important M buckets across EVERY format/shape first, so
    # an interrupted run still leaves broad coverage
    # 4096 last: the giant-M bucket tunes kernel-vs-dense-fallback routing
    M_PRIORITY = (1, 16, 512, 64, 8, 128, 2048, 2, 4, 32, 256, 1024, 4096)
    for M in M_PRIORITY:
        for (label, shapes, W_nbits, gs, dt) in COMBOS:
            for shape in shapes:
                tune_one(label, shape, W_nbits, gs, M, dt)

    # BASELINE.md sweep shapes beyond the Llama projections: large square
    # A16W4 gs=128 decode+prefill (reference README plots 4096^2..32768^2).
    # One autotune_shapes call per shape (weights built/uploaded once) over
    # the remaining M buckets.
    for side in (8192, 16384, 32768):
        Ms = []
        for M in (1, 16, 256, 1024):
            prefix = f"({m_bucket.get_closest_m(M)}, {side}, {side}, 128, 8,"
            if not any(s.startswith(prefix) for s in existing):
                Ms.append(M)
        if not Ms:
            continue
        print(f"=== W4 gs=128 square {side} M={Ms} ===", flush=True)
        try:
            autotune_shapes([(side, side)], W_nbits=4, group_size=128,
                            batch_sizes=tuple(Ms), effort="fast",
                            verbose=False)
        except Exception as e:
            print(f"  FAILED: {str(e)[:200]}", flush=True)
            continue
        cfg.cache_config(out)
        n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
        print(f"  -> {n} entries", flush=True)

    # optional: Llama-70B projection shapes (W4 gs=128 is the serving
    # config that matters at that scale)
    if "--llama70b" in sys.argv:
        L70 = [(8192, 8192), (28672, 8192), (8192, 28672), (1024, 8192)]
        for M in (1, 16, 512, 64, 2048, 256):
            for shape in L70:
                tune_one("W4 gs=128 70B", shape, 4, 128, M, None)

    n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
    print(f"FINAL: {n} entries in {out}", flush=True)


if __name__ == "__main__":
    main()
