# SPDX-License-Identifier: Apache-2.0
"""Third one-process real-chip session for round 4:

  1. bench.py headline x2 (fresh process, before heavy HBM churn)
  2. llama8b_bench W4 gs=128            (refresh the README number)
  3. llama8b_bench W4 gs=128 --fuse     (fused wqkv/gate_up end-to-end)
  4. llama8b_bench W2 gs=128 --fuse     (sub-nibble serving: 2.1 GB weights)

Usage: python -u scripts/round4_tpu_driver3.py [--skip N]
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
        t0 = stage(1, "bench.py headline x2")
        import bench as bench_mod
        for i in range(2):
            print(f"--- bench run {i+1} ---", flush=True)
            bench_mod.main()
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
        stage(2, "Llama-8B W4 gs=128")
        run_llama("W4", [])
    if skip < 3:
        stage(3, "Llama-8B W4 gs=128 fused")
        run_llama("W4-fused", ["--fuse"])
    if skip < 4:
        stage(4, "Llama-8B W2 gs=128 fused")
        run_llama("W2-fused", ["--nbits", "2", "--fuse"])

    print("\nDRIVER3 COMPLETE", flush=True)


if __name__ == "__main__":
    main()
