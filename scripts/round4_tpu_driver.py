# SPDX-License-Identifier: Apache-2.0
"""One-process driver for all round-4 real-chip work (the dev tunnel wedges
for ~10 min whenever a TPU process exits, so everything runs in ONE process):

  1. full TPUCHECK sweep (all M values) -> TPUCHECK.md
  2. W2/W1 VPU-floor probe (probe_w2_floor)
  3. MXFP4 flat-dot decode + bf16-build prefill perf check
  4. autotune the M in {128, 256, 512} prefill buckets (W4 gs=128) and the
     MXFP4/fp8 decode signatures -> extend gemlite_tpu/configs/v5_lite.json
  5. BENCH matrix -> BENCH_MATRIX.md (tpu_check already done in-process)
  6. bench.py headline x3 (ceiling-band evidence)

Usage: python -u scripts/round4_tpu_driver.py [--skip N] (skip first N stages)
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

    # -- 1: full TPUCHECK ---------------------------------------------------
    if skip < 1:
        t0 = stage(1, "full TPUCHECK sweep")
        import tpu_check
        argv = sys.argv
        sys.argv = ["tpu_check.py"]  # full (not quick), write-md default on
        try:
            tpu_check.main()
        except SystemExit as e:
            if e.code:
                print("TPUCHECK FAILED — aborting driver", flush=True)
                raise
        finally:
            sys.argv = argv
        print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    # -- 2: W2 floor probe --------------------------------------------------
    if skip < 2:
        t0 = stage(2, "W2/W1 VPU-floor probe")
        import probe_w2_floor
        probe_w2_floor.main()
        print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)

    # -- 3: MXFP4 perf spot-check -------------------------------------------
    if skip < 3:
        t0 = stage(3, "MXFP4 flat decode + bf16-build prefill perf")
        import numpy as np
        import jax.numpy as jnp
        import gemlite_tpu  # noqa: F401
        from gemlite_tpu import DType
        from gemlite_tpu.core import forward_functional
        from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune
        from bench import timed_slopes

        rng = np.random.default_rng(0)
        lay = mxfp_quantize_layer_for_autotune(4096, 4096, DType.MXFP4, rng)
        print("mx_flat:", lay.mx_flat, flush=True)
        meta = lay.meta
        tensors = tuple(lay.get_tensor_args())

        def run_flat(xx, meta=meta, tensors=tensors):
            return forward_functional(xx, None, list(tensors), meta)

        meta_b = meta._replace(mx_flat=0)

        def run_batched(xx, meta=meta_b, tensors=tensors):
            return forward_functional(xx, None, list(tensors), meta)

        x1 = jnp.asarray(rng.normal(size=(1, 4096)) * 0.3, jnp.bfloat16)
        x256 = jnp.asarray(rng.normal(size=(256, 4096)) * 0.3, jnp.bfloat16)
        sl = timed_slopes({"flat_m1": (run_flat, x1),
                           "batched_m1": (run_batched, x1)}, 150, 600)
        nbytes = 4096 * 4096 // 2 + (4096 // 32) * 4096 + 4096 * 2 + 4096 * 2
        for k, dt in sl.items():
            print(f"{k:12s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:6.1f} GB/s",
                  flush=True)
        sl2 = timed_slopes({"prefill_m256": (run_flat, x256)}, 40, 160)
        tf = 2 * 256 * 4096 * 4096 / sl2["prefill_m256"] / 1e12
        print(f"prefill_m256 {sl2['prefill_m256']*1e6:8.2f} us  {tf:6.1f} TF",
              flush=True)
        print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)

    # -- 4: autotune mid-M buckets + new-path decode signatures -------------
    if skip < 4:
        t0 = stage(4, "autotune M in {128,256,512} W4 gs=128 (+8192 square)")
        from gemlite_tpu.autotune import autotune_shapes, autotune_layer
        from gemlite_tpu import config as cfg
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "gemlite_tpu", "configs",
            "v5_lite.json")

        def save():
            cfg.cache_config(out)
            n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
            print(f"wrote {out} ({n} entries)", flush=True)

        for shape in ((4096, 4096), (8192, 8192), (14336, 4096),
                      (4096, 14336)):
            for bs in (128, 256, 512):
                print(f"=== W4 gs=128 {shape} M={bs} ===", flush=True)
                autotune_shapes([shape], W_nbits=4, group_size=128,
                                batch_sizes=(bs,), effort="fast",
                                verbose=True)
                save()
        # the two big BENCH_MATRIX mid-M rows (77.3% / 80.8% in round 3)
        for shape in ((16384, 16384), (32768, 32768)):
            print(f"=== W4 gs=128 {shape} M=256 ===", flush=True)
            autotune_shapes([shape], W_nbits=4, group_size=128,
                            batch_sizes=(256,), effort="fast", verbose=True)
            save()
        # new-path decode signatures: MXFP4 flat-dot + A8W8-FP8 nosub
        from gemlite_tpu.dtypes import DType as DT
        print("=== MXFP4 4096x4096 decode+prefill ===", flush=True)
        autotune_shapes([(4096, 4096)], input_dtype=DT.MXFP4,
                        batch_sizes=(1, 16, 256), effort="fast", verbose=True)
        save()
        print("=== A8W8-FP8 4096x4096 decode ===", flush=True)
        from gemlite_tpu.helper import A8W8_fp8_dynamic
        import numpy as _np
        Wf = _np.random.default_rng(0).normal(
            size=(4096, 4096)).astype(_np.float32) * 0.02
        lay8 = A8W8_fp8_dynamic().from_weights(Wf, None)
        autotune_layer(lay8, batch_sizes=(1, 16, 64), effort="fast",
                       verbose=True)
        save()
        print(f"stage 4 done in {time.time()-t0:.0f}s", flush=True)

    # -- 5: bench matrix ----------------------------------------------------
    if skip < 5:
        t0 = stage(5, "BENCH_MATRIX regeneration")
        import bench_matrix
        argv = sys.argv
        sys.argv = ["bench_matrix.py", "--write-md", "--skip-check"]
        try:
            bench_matrix.main()
        finally:
            sys.argv = argv
        print(f"stage 5 done in {time.time()-t0:.0f}s", flush=True)

    # -- 6: headline bench x3 ----------------------------------------------
    if skip < 6:
        t0 = stage(6, "bench.py headline x3 (ceiling band)")
        import bench as bench_mod
        for i in range(3):
            print(f"--- bench run {i+1} ---", flush=True)
            bench_mod.main()
        print(f"stage 6 done in {time.time()-t0:.0f}s", flush=True)

    print("\nDRIVER COMPLETE", flush=True)


if __name__ == "__main__":
    main()
