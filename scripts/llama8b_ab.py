# SPDX-License-Identifier: Apache-2.0
# Llama-8B fused-vs-unfused A/B at W4 and W2 (round-5 item 7 evidence;
# cached programs — cheap to re-run in any session).
import os, sys, time
REPO = "/root/repo"
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "examples"))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import llama8b_bench
for label, argv in [("W4", []), ("W4 fused", ["--fuse"]),
                    ("W2 fused", ["--nbits", "2", "--fuse"]),
                    ("W2", ["--nbits", "2"])]:
    print(f"===== {label} =====", flush=True)
    t0 = time.time()
    old = sys.argv
    sys.argv = ["llama8b_bench.py"] + argv
    try:
        llama8b_bench.main()
    finally:
        sys.argv = old
    print(f"{label} done in {time.time()-t0:.0f}s", flush=True)
