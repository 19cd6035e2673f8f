# SPDX-License-Identifier: Apache-2.0
"""Sixth real-chip mini-session: autotune the MXFP8 signatures the earlier
sessions skipped (its rows entered BENCH_MATRIX last), then re-time the two
MXFP8 points with the tuned configs.

Usage: python -u scripts/round4_tpu_driver6.py
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import numpy as np
    import jax.numpy as jnp
    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import DType
    from gemlite_tpu import config as cfg
    from gemlite_tpu.autotune import autotune_shapes
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune
    from bench import timed_slopes

    t0 = time.time()
    print("=== MXFP8 4096x4096 autotune (M=1,16,256) ===", flush=True)
    autotune_shapes([(4096, 4096)], input_dtype=DType.MXFP8,
                    batch_sizes=(1, 16, 256), effort="fast", verbose=True)
    out = os.path.join(REPO, "gemlite_tpu", "configs", "v5_lite.json")
    cfg.cache_config(out)
    print(f"wrote {out}", flush=True)

    rng = np.random.default_rng(0)
    lay = mxfp_quantize_layer_for_autotune(4096, 4096, DType.MXFP8, rng)
    meta = lay.meta
    tensors = tuple(lay.get_tensor_args())

    def run(xx, meta=meta, tensors=tensors):
        return forward_functional(xx, None, list(tensors), meta)

    x1 = jnp.asarray(rng.normal(size=(1, 4096)) * 0.3, jnp.bfloat16)
    x256 = jnp.asarray(rng.normal(size=(256, 4096)) * 0.3, jnp.bfloat16)
    nbytes = 4096 * 4096 + (4096 // 32) * 4096 + 4096 * 2 + 4096 * 2
    sl = timed_slopes({"mxfp8_m1": (run, x1)}, 150, 600)
    print(f"mxfp8_m1   {sl['mxfp8_m1']*1e6:8.2f} us  "
          f"{nbytes/sl['mxfp8_m1']/1e9:6.1f} GB/s", flush=True)
    sl2 = timed_slopes({"mxfp8_m256": (run, x256)}, 40, 160)
    tf = 2 * 256 * 4096 * 4096 / sl2["mxfp8_m256"] / 1e12
    print(f"mxfp8_m256 {sl2['mxfp8_m256']*1e6:8.2f} us  {tf:6.1f} TF",
          flush=True)
    print(f"done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
