# SPDX-License-Identifier: Apache-2.0
"""Fifth (final) one-process real-chip session for round 4:

  1. TPUCHECK quick gate (in-process; a gate SUBPROCESS would wedge the
     dev tunnel on exit)
  2. BENCH_MATRIX regeneration — fresh session: re-checks the anomalous
     BitNet M=256 point and adds the new MXFP8 rows
  3. bench.py headline x2

Usage: python -u scripts/round4_tpu_driver5.py [--skip N]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


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
        t0 = stage(1, "TPUCHECK quick gate")
        import tpu_check
        argv = sys.argv
        # --no-write-md: keep the committed FULL 94/94 sweep artifact;
        # this run is only the gate for stage 2's timings
        sys.argv = ["tpu_check.py", "--quick", "--no-write-md"]
        try:
            tpu_check.main()
        except SystemExit as e:
            if e.code:
                print("TPUCHECK FAILED — aborting", flush=True)
                raise
        finally:
            sys.argv = argv
        print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    if skip < 2:
        t0 = stage(2, "BENCH_MATRIX regeneration (fresh session, +MXFP8)")
        import bench_matrix
        argv = sys.argv
        sys.argv = ["bench_matrix.py", "--write-md", "--skip-check"]
        try:
            bench_matrix.main()
        finally:
            sys.argv = argv
        print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)

    if skip < 3:
        t0 = stage(3, "bench.py headline x2")
        import bench as bench_mod
        for i in range(2):
            print(f"--- bench run {i+1} ---", flush=True)
            bench_mod.main()
        print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)

    print("\nDRIVER5 COMPLETE", flush=True)


if __name__ == "__main__":
    main()
