# SPDX-License-Identifier: Apache-2.0
"""Fourth one-process real-chip session for round 4: tune the FUSED
projection shapes, then the fused-vs-unfused Llama-8B A/B.

  1. autotune M=1 decode sigs for the fused Llama-8B shapes:
       W4: (6144,4096) wqkv, (28672,4096) gate_up
       W2: (6144,4096), (28672,4096), (4096,4096) wo, (4096,14336) down
  2. llama8b W2 gs=128 (unfused control)
  3. llama8b W4 gs=128 --fuse   (re-run with tuned sigs)
  4. llama8b W2 gs=128 --fuse   (re-run with tuned sigs)

Usage: python -u scripts/round4_tpu_driver4.py [--skip N]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))


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

    if skip < 1:
        t0 = stage(1, "autotune fused-projection decode signatures")
        from gemlite_tpu.autotune import autotune_shapes
        from gemlite_tpu import config as cfg
        out = os.path.join(REPO, "gemlite_tpu", "configs", "v5_lite.json")
        for nb, shapes in ((4, ((6144, 4096), (28672, 4096))),
                           (2, ((6144, 4096), (28672, 4096),
                                (4096, 4096), (4096, 14336)))):
            for shape in shapes:
                print(f"=== W{nb} gs=128 {shape} M=1 ===", flush=True)
                autotune_shapes([shape], W_nbits=nb, group_size=128,
                                batch_sizes=(1,), effort="fast", verbose=True)
        cfg.cache_config(out)
        n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
        print(f"wrote {out} ({n} entries)", flush=True)
        print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    import llama8b_bench

    def run_llama(label, argv):
        t0 = time.time()
        print(f"--- {label} ---", flush=True)
        old = sys.argv
        sys.argv = ["llama8b_bench.py"] + argv
        try:
            llama8b_bench.main()
        finally:
            sys.argv = old
        print(f"{label} done in {time.time()-t0:.0f}s", flush=True)

    if skip < 2:
        stage(2, "Llama-8B W2 gs=128 (unfused control)")
        run_llama("W2", ["--nbits", "2"])
    if skip < 3:
        stage(3, "Llama-8B W4 fused (tuned sigs)")
        run_llama("W4-fused", ["--fuse"])
    if skip < 4:
        stage(4, "Llama-8B W2 fused (tuned sigs)")
        run_llama("W2-fused", ["--nbits", "2", "--fuse"])

    print("\nDRIVER4 COMPLETE", flush=True)


if __name__ == "__main__":
    main()
