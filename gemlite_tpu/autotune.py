# SPDX-License-Identifier: Apache-2.0
"""Explicit kernel autotuner.

TPU replacement for the reference's @triton.autotune machinery
(gemm_kernels.py:131-240 config generators + kernel_config_pruner +
the cross-process JSON cache, core.py:74-83): enumerate candidate Pallas
block configurations per kernel family, prune by VMEM budget and shape
constraints, benchmark on-device with chained-loop slope timing (host/RPC
overhead cancels between two loop lengths), and store the winner in the
persisted config cache keyed by the same signature the reference uses:
``str((M_bucket, N, K, group_size, elements_per_sample, type_id))``.

Effort levels mirror the reference AUTOTUNE modes: 'max' sweeps the full
candidate set, 'fast' a pruned subset, 'default'/False uses heuristics only.
"""

import itertools
import logging
import time

import numpy as np

from .config import (
    AUTOTUNE,
    KernelConfig,
    config_signature,
    store_config,
)
from .dtypes import DType, to_jax_dtype, is_mx_dtype
from .utils import m_bucket

logger = logging.getLogger(__name__)

# conservative VMEM budget per core (bytes); block working set x2 for
# double-buffering must fit. v4/v5/v6 have 64-128 MiB; leave headroom.
VMEM_BUDGET = 48 * 1024 * 1024


def _candidate_grid(effort: str, M, N, K, group_size):
    """(block_m, block_n, block_k) candidates by effort level. The 'fast'
    grids are the measured-good regions on v5e (scripts/probe_fold3.py,
    probe_bench_ab.py, probe_prefill_tail*.py); 'max' sweeps wider."""
    if M == 1:
        bms = [8]
    elif M <= 64:
        bms = [b for b in (8, 16, 32, 64) if b <= max(8, 2 * M)]
    else:  # prefill: whole-M blocks measured best on v5e up to 2048
        bms = sorted({min(b, 2048) for b in (128, 256, 512, M)
                      if b >= 128 and b <= max(128, M)})
        if effort != "max":
            # whole-M only: sub-M blocks (bm=128 at M in {256,512}) measured
            # ~2x SLOWER across every BASELINE shape on v5e (round-4 driver2
            # stage 4: 67.2 vs 114.7 us at 4096^2 M=256, same pattern at
            # 8192^2/14336/16384^2/32768^2) — the m-innermost grid already
            # builds the dequant cache once per (j, k) block, and smaller bm
            # only adds grid-step overhead
            bms = [min(2048, max(128, M))]
    if effort == "max":
        bns = [256, 512, 1024, 2048, 4096]
        bks = [128, 256, 512, 1024, 2048, 4096]
    elif M > 64:  # fast prefill: narrow-n deep-k region (4 candidates)
        bns = [512, 1024]
        bks = [4096, 2048]
    else:         # fast decode: the top measured folded orders (4 candidates)
        bns = [2048, 1024]
        bks = [1024, 2048]
    bns = [b for b in bns if N % b == 0] or [b for b in (256, 128) if N % b == 0]
    bks = [b for b in bks if K % b == 0] or [b for b in (512, 256, 128) if K % b == 0]
    cands = [KernelConfig(bm, bn, bk)
             for bm, bn, bk in itertools.product(bms, bns, bks)]
    if M > 64:
        # prefill build knobs (bf16 cache arithmetic / sub-column interleave):
        # at mid-M the VPU dequant-cache build is a large fraction of the MXU
        # dot time (57-77% of peak at M=256 in round 3), and these knobs are
        # exactly the overlap/traffic levers — probe them at every effort
        knobs = (((True, 1), (False, 2), (True, 2)) if effort == "max"
                 else ((True, 1), (True, 2), (False, 2), (True, 4)))
        cands += [KernelConfig(c.block_m, c.block_n, c.block_k,
                               build_bf16=bf, n_sub=ns)
                  for c in list(cands)
                  for bf, ns in knobs
                  if c.block_n % (ns * 128) == 0]
    return cands


def _vmem_ok(meta, cfg: KernelConfig) -> bool:
    """Block working-set estimate vs budget (the shared-memory prune analog,
    reference gemm_kernels.py:91-100)."""
    import jax.numpy as jnp

    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    elems = meta.elements_per_sample
    w_bytes = (bk // max(1, elems)) * bn * 4
    x_bytes = bm * bk * 2
    planes_bytes = bk * bn * 2          # unpacked bf16 block (worst case)
    acc_bytes = bm * bn * 4
    K = meta.in_features
    gs = meta.group_size if 1 < meta.group_size < K else K
    meta_bytes = 2 * (K // gs) * bn * 4
    total = 2 * (w_bytes + x_bytes) + planes_bytes + acc_bytes + meta_bytes
    return total <= VMEM_BUDGET


def _bench_call(fn, x, n1=100, n2=400, repeats=3, consts=()):
    """Per-call seconds via chained fori_loop slope (overhead cancels).

    ``consts``: weight/meta arrays the candidate needs — they ride as jit
    ARGUMENTS, never as closure constants: a closed-over array is embedded
    into the compiled program as a literal, which at 32768^2 means
    serializing ~1 GB through the compile path PER CANDIDATE (the round-4
    stage-4 wedge; bench.py learned the same lesson in its allocation
    sampling). fn is called as fn(xx, *consts)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x, consts, n):
        def body(i, c):
            xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
            y = fn(xx, *consts)
            # consume the FULL output: a [0] slice lets XLA DCE
            # most of the pure-XLA fallback candidate, biasing the
            # fused-vs-fallback comparison (Pallas calls are opaque)
            return jnp.sum(y.astype(jnp.float32)) * 1e-12
        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(x, tuple(consts), n2))  # compile + warm

    def slope(n1, n2, reps):
        best = {}
        for n in (n1, n2) * reps:
            t0 = time.perf_counter()
            float(loop(x, tuple(consts), n))
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
        return (best[n2] - best[n1]) / (n2 - n1)

    dt = slope(n1, n2, repeats)
    # Adaptive noise guard: through the dev tunnel the per-call RPC jitter
    # can reach several ms, so a slope whose (n2-n1)*dt delta is under
    # ~25 ms is unreliable (round-5 symptom: "measured" rates above the
    # hardware peak). Rescale n so the delta clears the floor and re-run.
    delta = (n2 - n1) * max(dt, 0.0)
    if delta < 0.025:
        per = max(dt, 1e-7) if dt > 0 else 1e-6
        scale = min(max(int(0.03 / (per * (n2 - n1))), 2), 64)
        dt = slope(n1 * scale, n2 * scale, repeats)
    return dt


def autotune_layer(layer, batch_sizes=(1, 8, 32, 128, 512), effort=None,
                   verbose=False):
    """Benchmark candidate configs for one packed layer across batch regimes
    and store winners in the config cache. Returns {sig: best_config}."""
    import jax.numpy as jnp

    from .core import get_matmul_type
    from .ops.dispatch import autotune_type_id
    from .ops.pallas_decode import can_use_decode_kernel, pallas_decode_matmul
    from .ops.pallas_prefill import can_use_prefill_kernel, pallas_prefill_matmul
    from .ops.pallas_gemm import can_use_pallas, pallas_fused_matmul

    meta = layer.meta
    N, K = meta.out_features, meta.in_features
    mx = is_mx_dtype(DType(meta.input_dtype))
    x_dtype = to_jax_dtype(DType(meta.output_dtype))
    rng = np.random.default_rng(0)
    results = {}

    for M in batch_sizes:
        family = get_matmul_type(M, meta.W_nbits, mx)
        eff = effort if effort is not None else getattr(AUTOTUNE, family, "fast")
        if not eff or eff == "default":
            continue
        sig = config_signature(m_bucket.get_closest_m(M), N, K,
                               meta.group_size, meta.elements_per_sample,
                               autotune_type_id(meta))
        x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, x_dtype)
        is_int8 = DType(meta.input_dtype) == DType.INT8
        x_i8 = sx_ones = None
        if is_int8 and M <= 64:
            from .ops.pallas_int8 import (can_use_int8_decode,
                                          pallas_int8_decode,
                                          select_int8_decode_config)
            x_i8 = jnp.asarray(rng.integers(-128, 128, size=(M, K)), jnp.int8)
            sx_ones = jnp.ones((M, 1), jnp.float32)
            int8_heur_ok = can_use_int8_decode(
                meta, M, N, K, select_int8_decode_config(meta, M, N, K))

        cands = _candidate_grid(eff, M, N, K, meta.group_size)
        if M >= 2048:
            # giant-M pseudo-candidate: the two-pass dense route (Pallas
            # dequantize + dense MXU matmul). Storing it as a table entry
            # makes the giant-M kernel-vs-fallback decision measured, not
            # hardcoded (ops/dispatch.py giant-M branch).
            cands.append(KernelConfig(0, 0, 0, route="fallback"))

        best_cfg, best_t = None, float("inf")
        for cfg in cands:
            if cfg.route == "fallback":
                from .ops.dispatch import _dense_fallback_matmul
                run = lambda xx, W, sc, z: _dense_fallback_matmul(
                    xx, W, sc, z, None, meta)
                cargs = (layer.W_q, layer.scales, layer.zeros)
                try:
                    run(x, *cargs)
                    dt = _bench_call(run, x, consts=cargs)
                except Exception as e:
                    if verbose:
                        logger.info("fallback rejected: %s", str(e)[:80])
                    continue
                if 0 < dt < best_t:
                    best_cfg, best_t = cfg, dt
                if verbose:
                    logger.warning("M=%d %s %s: %.1f us", M, family, cfg,
                                   dt * 1e6)
                continue
            if not _vmem_ok(meta, cfg):
                continue
            # mirror dispatch's kernel precedence EXACTLY: storing a config
            # timed on a kernel dispatch would not run for it makes the
            # table entry meaningless (or worse than the heuristic)
            xb = x
            cargs = (layer.W_q, layer.scales, layer.zeros)
            if M <= 64 and is_int8:
                if can_use_int8_decode(meta, M, N, K, cfg):
                    run = lambda xx, W, sc, z, sx, c=cfg: pallas_int8_decode(
                        xx, W, sc, z, sx, meta, c)
                    cargs = cargs + (sx_ones,)
                    xb = x_i8
                elif int8_heur_ok:
                    # dispatch would ignore this cfg and run the heuristic
                    # int8 config instead — nothing meaningful to measure
                    continue
                elif can_use_decode_kernel(meta, M, N, K, cfg):
                    run = lambda xx, W, sc, z, c=cfg: pallas_decode_matmul(
                        xx, W, sc, z, None, meta, c)
                else:
                    continue
            elif M <= 64 and can_use_decode_kernel(meta, M, N, K, cfg):
                run = lambda xx, W, sc, z, c=cfg: pallas_decode_matmul(
                    xx, W, sc, z, None, meta, c)
            elif can_use_prefill_kernel(meta, M, N, K, cfg):
                # dispatch tries the prefill kernel both in the prefill
                # regime and as the M <= 64 fallback (NVFP4)
                run = lambda xx, W, sc, z, c=cfg: pallas_prefill_matmul(
                    xx, W, sc, z, None, meta, c)
            elif M >= 4096:
                # dispatch's giant-M branch only honors prefill-kernel
                # configs (+ the fallback route) — timing any other kernel
                # here would store a config dispatch can't reproduce
                continue
            elif can_use_pallas(meta, M, N, K, cfg) and cfg.block_m >= 8:
                run = lambda xx, W, sc, z, c=cfg: pallas_fused_matmul(
                    xx, W, sc, z, None, meta, c)
            else:
                continue
            try:
                run(xb, *cargs)  # compile check
                dt = _bench_call(run, xb, consts=cargs)
            except Exception as e:  # config rejected by Mosaic
                if verbose:
                    logger.info("cfg %s rejected: %s", cfg, str(e)[:80])
                continue
            if 0 < dt < best_t:
                best_cfg, best_t = cfg, dt
            if verbose:
                logger.warning("M=%d %s %s: %.1f us", M, family, cfg, dt * 1e6)

        if best_cfg is not None:
            store_config(family, sig, best_cfg)
            if M == 1:
                # all three M==1 family names (GEMV / GEMV_REVSPLITK /
                # GEMV_SPLITK — reference registry core.py:56-66) dispatch to
                # the SAME decode kernel here, so the measured winner applies
                # under whichever name the user routes through (incl.
                # forward_manual); mirror it so no family table stays empty
                for alias in ("GEMV", "GEMV_REVSPLITK", "GEMV_SPLITK"):
                    if alias != family:
                        store_config(alias, sig, best_cfg)
            results[sig] = (family, best_cfg, best_t)
            if verbose:
                logger.warning("M=%d %s best: %s (%.1f us)",
                               M, family, best_cfg, best_t * 1e6)
    return results


def autotune_shapes(shapes, processor=None, W_nbits=4, group_size=128,
                    batch_sizes=(1, 8, 32, 128, 512), effort=None,
                    verbose=False, input_dtype=None):
    """Autotune a list of (out_features, in_features) shapes with synthetic
    weights; the warmup-time entry point (reference helper.py:1068-1119
    warmup + cache_config). ``input_dtype``: DType.BF16 (default) for
    weight-only INT layers, or an MX dtype (MXFP4/NVFP4/MXFP8) to tune the
    microscaling formats (their type ids key separate cache entries)."""
    from .core import GemLiteLinear

    rng = np.random.default_rng(0)
    all_results = {}
    for (N, K) in shapes:
        if input_dtype is not None and is_mx_dtype(input_dtype):
            from .mx import mxfp_quantize_layer_for_autotune
            layer = mxfp_quantize_layer_for_autotune(N, K, input_dtype, rng)
        else:
            W_q = rng.integers(0, 2**W_nbits, size=(N, K)).astype(np.uint8)
            G = N * K // group_size
            scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
            zeros = rng.integers(0, 2**W_nbits, size=(G, 1)).astype(np.float32)
            layer = GemLiteLinear(W_nbits, group_size, K, N,
                                  DType.BF16, DType.BF16).pack(W_q, scales, zeros)
        all_results.update(autotune_layer(layer, batch_sizes, effort, verbose))
    return all_results
