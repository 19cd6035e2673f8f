# SPDX-License-Identifier: Apache-2.0
"""Profiling + roofline reporting utilities.

The reference has no built-in tracing (SURVEY.md section 5.1) — benchmarking
lives in examples/benchmark_triton.py with CUDA events. On TPU the idiomatic
tools are jax.profiler traces plus a bandwidth roofline model, so this module
provides both: ``trace()`` wraps jax.profiler, ``measure()`` gives robust
per-call device time (chained-loop slope — host/RPC overhead cancels), and
``roofline_report()`` turns a fused-matmul timing into achieved GB/s vs the
chip's HBM bandwidth.
"""

import contextlib
import time
from dataclasses import dataclass

__all__ = ["trace", "measure", "roofline_report", "hbm_bandwidth_gbps",
           "RooflineReport"]

# Spec-sheet HBM bandwidth per chip, GB/s.
HBM_GBPS = {
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1638.0,
    "v6 lite": 1638.0,
}


def hbm_bandwidth_gbps(default: float = 819.0) -> float:
    """HBM bandwidth of the attached chip by device-kind match."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for tag, bw in HBM_GBPS.items():
        if tag in kind:
            return bw
    return default


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gemlite_tpu_trace"):
    """jax.profiler trace context; view with tensorboard or xprof."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


def measure(fn, x, n1: int = 200, n2: int = 800, repeats: int = 3) -> float:
    """Per-call seconds of ``fn(x)`` via two chained fori_loop lengths.

    Dispatch/RPC overhead is identical for both loop lengths, so the slope
    (t2 - t1) / (n2 - n1) isolates pure device time per call. ``fn`` must
    return an array whose first element depends on the input.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(x, n):
        def body(i, c):
            xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
            y = fn(xx)
            return y.astype(jnp.float32).ravel()[0] * 1e-12
        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(x, n2))  # compile + warm
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


@dataclass
class RooflineReport:
    seconds: float
    bytes_moved: int
    achieved_gbps: float
    hbm_gbps: float
    fraction_of_roofline: float

    def __str__(self):
        return (f"{self.seconds*1e6:.1f} us, {self.achieved_gbps:.1f} GB/s "
                f"({100*self.fraction_of_roofline:.1f}% of "
                f"{self.hbm_gbps:.0f} GB/s HBM roofline)")


def roofline_report(fn, x, bytes_moved: int, **measure_kw) -> RooflineReport:
    """Measure ``fn(x)`` and report achieved bandwidth vs the HBM roofline.

    ``bytes_moved`` should count every HBM byte the op must stream (packed
    weights + group metadata + activations + output) — for memory-bound
    low-bit matmuls that is the right roofline axis.
    """
    dt = measure(fn, x, **measure_kw)
    hbm = hbm_bandwidth_gbps()
    gbps = bytes_moved / dt / 1e9
    return RooflineReport(dt, bytes_moved, gbps, hbm, gbps / hbm)
