# SPDX-License-Identifier: Apache-2.0
"""Round-5 real-chip perf session (VERDICT items 3, 5, 8, 10 + bench).

Stage order is deliberate: BitNet M=256 runs FIRST (the round-4 number was
measured late-session at 71-76% vs round-3's 86%; ROADMAP said re-measure in
a FRESH session — this is that measurement, before any heavy HBM churn).

  1. BitNet W1.58 M=1/256 fresh-session measurement (item 10)
  2. W4 4096^2 decode autotune at M in {8,16,24,32,48,64} + re-time the
     M sweep vs M=1 (item 5 — the batched-decode band dip)
  3. MXFP8 autotune + re-time M=1/256 after the scaled-fold prefill build
     (item 3; target >= 75% of MXU at M=256)
  4. NVFP4 autotune + first-ever perf rows M=1/16/256 (item 8)
  5. bench.py (new 8192^2 headline + 4096^2 ceiling-relative row)

Usage: python -u scripts/round5_perf_driver.py [--skip N]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

HBM = 819.0
MXU = 197.0


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

    import jax.numpy as jnp
    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu import config as cfgmod
    from gemlite_tpu.autotune import autotune_shapes
    from gemlite_tpu.core import forward_functional
    from gemlite_tpu.mx import mxfp_quantize_layer_for_autotune
    from bench import timed_slopes

    rng = np.random.default_rng(0)
    out_json = os.path.join(REPO, "gemlite_tpu", "configs", "v5_lite.json")

    def pack_int(W_nbits, gs, N, K):
        W_q = rng.integers(0, 2 ** W_nbits, size=(N, K)).astype(np.uint8)
        gse = gs or K
        G = N * K // gse
        scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0 ** -8
                  ).astype(np.float32)
        zeros = rng.integers(0, 2 ** W_nbits, size=(G, 1)).astype(np.float32)
        return GemLiteLinear(W_nbits, gs or K, K, N, DType.BF16,
                             DType.BF16).pack(W_q, scales, zeros)

    def point(label, layer, M, n1=150):
        meta = layer.meta
        N, K = meta.out_features, meta.in_features
        tensors = tuple(layer.get_tensor_args())

        def run(xx, *tt):
            return forward_functional(xx, None, list(tt), meta)

        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
        if M > 64:
            n1 = max(20, n1 // 4)
        sl = timed_slopes({label: (run, x, tensors)}, n1, 4 * n1, repeats=5)
        dt = sl[label]
        # adaptive noise guard (see autotune._bench_call): rescale n until
        # the slope delta clears the tunnel jitter floor, and reject
        # physically-impossible rates outright
        wq_bytes = np.asarray(layer.W_q).nbytes
        for _ in range(3):
            delta = 3 * n1 * max(dt, 0.0)
            tf_rate = 2 * M * N * K / dt / 1e12 if dt > 0 else float("inf")
            bw_rate = wq_bytes / dt / 1e9 if dt > 0 else float("inf")
            if delta >= 0.025 and tf_rate < 1.05 * MXU and bw_rate < 1.2 * HBM:
                break
            n1 = min(n1 * 4, 40000)
            sl = timed_slopes({label: (run, x, tensors)}, n1, 4 * n1,
                              repeats=6)
            dt = sl[label]
        meta_b = sum(np.asarray(t).nbytes for t in tensors[1:]
                     if t is not None)
        wbytes = np.asarray(layer.W_q).nbytes + meta_b + x.nbytes + M * N * 2
        gbps = wbytes / dt / 1e9
        tf = 2 * M * N * K / dt / 1e12
        pct = 100 * gbps / HBM if M <= 64 else 100 * tf / MXU
        print(f"{label:24s} M={M:<5d}: {dt*1e6:9.2f} us  {gbps:7.1f} GB/s  "
              f"{tf:7.2f} TF  {pct:5.1f}%", flush=True)
        return dict(label=label, M=M, us=dt * 1e6, gbps=gbps, tf=tf, pct=pct)

    # ---------------- stage 1: BitNet fresh-session ----------------------
    if skip < 1:
        t0 = stage(1, "BitNet W1.58 fresh-session M=1/256 (item 10)")
        from gemlite_tpu.helper import A16W158_INT
        w_tern = rng.integers(-1, 2, size=(4096, 4096)).astype(np.float32)
        l = A16W158_INT(dtype=jnp.bfloat16).from_weights(w_tern, 0.02)
        point("BitNet W1.58", l, 1)
        point("BitNet W1.58", l, 256)
        del l, w_tern
        print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    # ---------------- stage 2: W4 mid-decode autotune --------------------
    if skip < 2:
        t0 = stage(2, "W4 4096^2 decode autotune M in {8..64} (item 5)")
        l = pack_int(4, 128, 4096, 4096)
        before = {M: point("W4 pre-tune", l, M) for M in (1, 8, 16, 32, 64)}
        autotune_shapes([(4096, 4096)], W_nbits=4, group_size=128,
                        batch_sizes=(8, 16, 24, 32, 48, 64), effort="fast",
                        verbose=True)
        cfgmod.cache_config(out_json)
        print(f"wrote {out_json}", flush=True)
        after = {M: point("W4 post-tune", l, M) for M in (1, 8, 16, 32, 64)}
        g1 = after[1]["gbps"]
        for M in (8, 16, 32, 64):
            print(f"  M={M}: {before[M]['gbps']:.1f} -> "
                  f"{after[M]['gbps']:.1f} GB/s "
                  f"({100*after[M]['gbps']/g1:.1f}% of M=1)", flush=True)
        del l
        print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)

    # ---------------- stage 3: MXFP8 post-scaled-fold --------------------
    if skip < 3:
        t0 = stage(3, "MXFP8 autotune + re-time after scaled-fold (item 3)")
        l = mxfp_quantize_layer_for_autotune(4096, 4096, DType.MXFP8, rng)
        assert l.fp8_nosub == 2, f"expected scaled-fold grade, {l.fp8_nosub}"
        point("MXFP8 pre-tune", l, 1)
        point("MXFP8 pre-tune", l, 256)
        autotune_shapes([(4096, 4096)], input_dtype=DType.MXFP8,
                        batch_sizes=(1, 16, 256), effort="fast", verbose=True)
        cfgmod.cache_config(out_json)
        point("MXFP8 post-tune", l, 1)
        r = point("MXFP8 post-tune", l, 256)
        print(f"  MXFP8 M=256: {r['pct']:.1f}% of MXU (target >= 75)",
              flush=True)
        del l
        print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)

    # ---------------- stage 4: NVFP4 first perf rows ---------------------
    if skip < 4:
        t0 = stage(4, "NVFP4 autotune + first perf rows (item 8)")
        l = mxfp_quantize_layer_for_autotune(4096, 4096, DType.NVFP4, rng)
        for M in (1, 16, 256):
            point("NVFP4 pre-tune", l, M)
        autotune_shapes([(4096, 4096)], input_dtype=DType.NVFP4,
                        batch_sizes=(1, 16, 256), effort="fast", verbose=True)
        cfgmod.cache_config(out_json)
        for M in (1, 16, 256):
            point("NVFP4 post-tune", l, M)
        del l
        print(f"stage 4 done in {time.time()-t0:.0f}s", flush=True)

    # ---------------- stage 5: bench.py headline -------------------------
    if skip < 5:
        t0 = stage(5, "bench.py (8192 headline + 4096 ceiling-relative)")
        import bench as bench_mod
        for i in range(2):
            print(f"--- bench run {i+1} ---", flush=True)
            bench_mod.main()
        print(f"stage 5 done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
