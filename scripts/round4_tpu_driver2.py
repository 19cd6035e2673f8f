# SPDX-License-Identifier: Apache-2.0
"""Second one-process real-chip session for round 4 (run AFTER
round4_tpu_driver.py; everything in one process — the dev tunnel wedges
~10 min per TPU process exit):

  1. TPUCHECK (full) — the fp4x2 MXFP4 re-encode landed after driver 1's
     sweep, so every dispatch path re-verifies on the real chip
  2. MXFP4 fp4x2 decode/prefill perf vs the legacy codec (A/B)
  3. W2 fused-projection probe (probe_w2_fused: N=4096 vs fused 8192/12288)
  4. BENCH matrix regeneration (now measuring the fp4x2 MXFP4 rows)
  5. bench.py headline x3 (ceiling-band evidence)

Usage: python -u scripts/round4_tpu_driver2.py [--skip N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def stage(n, title):
    print(f"\n========== STAGE {n}: {title} ==========", flush=True)
    return time.time()


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # -- 1: full TPUCHECK (post-fp4x2) --------------------------------------
    if skip < 1:
        t0 = stage(1, "full TPUCHECK sweep (fp4x2 codec live)")
        import tpu_check
        argv = sys.argv
        sys.argv = ["tpu_check.py"]
        try:
            tpu_check.main()
        except SystemExit as e:
            if e.code:
                print("TPUCHECK FAILED — aborting driver", flush=True)
                raise
        finally:
            sys.argv = argv
        print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    # -- 2: fp4x2 vs legacy MXFP4 A/B ---------------------------------------
    if skip < 2:
        t0 = stage(2, "MXFP4 fp4x2 vs legacy codec A/B")
        import numpy as np
        import jax.numpy as jnp
        import gemlite_tpu  # noqa: F401
        from gemlite_tpu.core import forward_functional, set_mx_x2
        from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune
        from gemlite_tpu import DType
        from bench import timed_slopes

        rng = np.random.default_rng(0)
        lay = mxfp_quantize_layer_for_autotune(4096, 4096, DType.MXFP4, rng)
        set_mx_x2(False)
        try:
            lay0 = mxfp_quantize_layer_for_autotune(4096, 4096, DType.MXFP4,
                                                    np.random.default_rng(0))
        finally:
            set_mx_x2(True)
        print("x2:", lay.mx_x2, " legacy flat:", lay0.mx_flat, flush=True)

        def run(l):
            meta = l.meta
            tensors = tuple(l.get_tensor_args())

            def f(xx, meta=meta, tensors=tensors):
                return forward_functional(xx, None, list(tensors), meta)
            return f

        x1 = jnp.asarray(rng.normal(size=(1, 4096)) * 0.3, jnp.bfloat16)
        x256 = jnp.asarray(rng.normal(size=(256, 4096)) * 0.3, jnp.bfloat16)
        meta0b = lay0.meta._replace(mx_flat=0)
        tensors0 = tuple(lay0.get_tensor_args())

        def run_batched0(xx, meta=meta0b, tensors=tensors0):
            return forward_functional(xx, None, list(tensors), meta)

        # correctness first: x2 vs legacy on identical weights
        y2 = np.asarray(run(lay)(x1), np.float32)
        y0 = np.asarray(run(lay0)(x1), np.float32)
        rel = np.abs(y2 - y0).mean() / (np.abs(y0).mean() + 1e-12)
        print(f"x2 vs legacy M=1 rel = {rel:.2e}", flush=True)
        assert rel < 2e-3, rel

        sl = timed_slopes({"x2_m1": (run(lay), x1),
                           "legacy_flat_m1": (run(lay0), x1),
                           "legacy_batched_m1": (run_batched0, x1)}, 150, 600)
        nbytes = 4096 * 4096 // 2 + (4096 // 32) * 4096 + 4096 * 2 + 4096 * 2
        for k, dt in sl.items():
            print(f"{k:18s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:6.1f} GB/s",
                  flush=True)
        sl2 = timed_slopes({"x2_m256": (run(lay), x256),
                            "legacy_m256": (run(lay0), x256)}, 40, 160)
        for k, dt in sl2.items():
            tf = 2 * 256 * 4096 * 4096 / dt / 1e12
            print(f"{k:18s} {dt*1e6:8.2f} us  {tf:6.1f} TF", flush=True)
        print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)

    # -- 3: W2 fused-projection probe ---------------------------------------
    if skip < 3:
        t0 = stage(3, "W2 fused-projection probe")
        import probe_w2_fused
        probe_w2_fused.main()
        print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)

    # -- 4: mid-M sub-M-block probe ------------------------------------------
    if skip < 4:
        t0 = stage(4, "mid-M bm=128 build-amortization probe")
        import numpy as np
        import jax.numpy as jnp
        import gemlite_tpu  # noqa: F401
        from gemlite_tpu import DType, GemLiteLinear
        from gemlite_tpu import config as cfg_mod
        from gemlite_tpu.config import (config_signature, store_config,
                                        lookup_config)
        from gemlite_tpu.ops.dispatch import autotune_type_id
        from gemlite_tpu.ops.pallas_prefill import pallas_prefill_matmul
        from gemlite_tpu.utils import m_bucket
        from gemlite_tpu.autotune import _bench_call
        import dataclasses

        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "gemlite_tpu", "configs",
            "v5_lite.json")
        rng = np.random.default_rng(0)
        from gemlite_tpu.ops.pallas_prefill import select_prefill_config
        for (N, K) in ((4096, 4096), (8192, 8192), (14336, 4096),
                       (4096, 14336), (16384, 16384), (32768, 32768)):
            W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
            G = N * K // 128
            scales = (rng.uniform(0.5, 1.5, (G, 1)) * 2.0**-8).astype(
                np.float32)
            zeros = rng.integers(0, 16, (G, 1)).astype(np.float32)
            lay = GemLiteLinear(4, 128, K, N, DType.BF16, DType.BF16).pack(
                W_q, scales, zeros)
            meta = lay.meta
            for M in (128, 256, 512):
                sig = config_signature(m_bucket.get_closest_m(M), N, K, 128,
                                       meta.elements_per_sample,
                                       autotune_type_id(meta))
                cur = lookup_config("GEMM", sig)
                stored = cur is not None
                if cur is None:
                    # untuned signature (the 32768^2 bucket the round-4
                    # stage-4 wedge skipped): A/B from the heuristic
                    cur = select_prefill_config(meta, M, N, K)
                if N >= 32768 and M != 256:
                    continue  # only the BENCH_MATRIX point at this size
                x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
                cands = {"stored": cur}
                if M > 128 and cur.block_m != 128:
                    cands["bm128"] = dataclasses.replace(cur, block_m=128)
                times = {}
                cargs = (lay.W_q, lay.scales, lay.zeros)
                for name, c in cands.items():
                    try:
                        run = lambda xx, W, sc, z, c=c: pallas_prefill_matmul(
                            xx, W, sc, z, None, meta, c)
                        run(x, *cargs)
                        times[name] = _bench_call(run, x, consts=cargs)
                    except Exception as e:  # noqa: BLE001
                        print(f"  {name} failed: {str(e)[:80]}", flush=True)
                if not times:
                    continue
                best = min(times, key=times.get)
                tf = 2 * M * N * K / times[best] / 1e12
                print(f"{N}x{K} M={M}: " + "  ".join(
                    f"{n}={t*1e6:.1f}us" for n, t in times.items())
                    + f"  -> {best} ({tf:.1f} TF)", flush=True)
                if best != "stored" or not stored:
                    store_config("GEMM", sig, cands[best])
        from gemlite_tpu.autotune import autotune_shapes, autotune_layer
        from gemlite_tpu import config as cfg_mod2
        from gemlite_tpu.dtypes import DType as DT
        out2 = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "gemlite_tpu", "configs",
            "v5_lite.json")
        import numpy as _np
        print("=== MXFP4 4096x4096 decode+prefill ===", flush=True)
        autotune_shapes([(4096, 4096)], input_dtype=DT.MXFP4,
                        batch_sizes=(1, 16, 256), effort="fast", verbose=True)
        print("=== A8W8-FP8 4096x4096 decode ===", flush=True)
        from gemlite_tpu.helper import A8W8_fp8_dynamic
        Wf = _np.random.default_rng(0).normal(
            size=(4096, 4096)).astype(_np.float32) * 0.02
        lay8 = A8W8_fp8_dynamic().from_weights(Wf, None)
        autotune_layer(lay8, batch_sizes=(1, 16, 64), effort="fast",
                       verbose=True)
        cfg_mod2.cache_config(out2)
        n = sum(len(v) for v in cfg_mod2.GEMLITE_TPU_CONFIG_CACHE.values())
        print(f"wrote {out2} ({n} entries)", flush=True)
        cfg_mod.cache_config(out)
        print(f"stage 4 done in {time.time()-t0:.0f}s", flush=True)

    # -- 5: bench matrix -----------------------------------------------------
    if skip < 5:
        t0 = stage(5, "BENCH_MATRIX regeneration (fp4x2 live)")
        import bench_matrix
        argv = sys.argv
        sys.argv = ["bench_matrix.py", "--write-md", "--skip-check"]
        try:
            bench_matrix.main()
        finally:
            sys.argv = argv
        print(f"stage 5 done in {time.time()-t0:.0f}s", flush=True)

    # -- 6: headline bench x3 ------------------------------------------------
    if skip < 6:
        t0 = stage(6, "bench.py headline x3 (ceiling band)")
        import bench as bench_mod
        for i in range(3):
            print(f"--- bench run {i+1} ---", flush=True)
            bench_mod.main()
        print(f"stage 6 done in {time.time()-t0:.0f}s", flush=True)

    print("\nDRIVER2 COMPLETE", flush=True)


if __name__ == "__main__":
    main()
