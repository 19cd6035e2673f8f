# SPDX-License-Identifier: Apache-2.0
"""Chip bandwidth calibration: XLA + Pallas streaming floors for the roofline
report (standalone; timing helpers shared with scripts/probe_fold.py)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from scripts.probe_fold import timed_robust, report


class p3:  # compat shim for the report helper
    report = staticmethod(report)



rng = np.random.default_rng(0)

# (a) XLA native bf16 GEMV decode: (1,4096)@(4096,4096) = 33.5MB bf16 weights
W = jnp.asarray(rng.normal(size=(4096, 4096)) * 0.1, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(1, 4096)) * 0.1, jnp.bfloat16)
dt = timed_robust(lambda xx: jnp.dot(xx, W, preferred_element_type=jnp.float32), x)
p3.report("XLA bf16 gemv 4096x4096 (33.5MB)", dt, 2*4096*4096)

# (b) XLA int8 gemv equivalent bytes 16.7MB
W8 = jnp.asarray(rng.integers(-127, 127, size=(4096, 4096)), jnp.int8)
dt = timed_robust(lambda xx: jnp.dot((xx*10).astype(jnp.int8), W8,
                                     preferred_element_type=jnp.int32).astype(jnp.float32), x)
p3.report("XLA int8 gemv 4096x4096 (16.7MB)", dt, 4096*4096)

# (c) big bf16 matmul M=128 to see MXU+stream 8192x8192 = 134MB
Wb = jnp.asarray(rng.normal(size=(8192, 8192)) * 0.1, jnp.bfloat16)
xb = jnp.asarray(rng.normal(size=(128, 8192)) * 0.1, jnp.bfloat16)
dt = timed_robust(lambda xx: jnp.dot(xx, Wb, preferred_element_type=jnp.float32), xb,
                  n1=50, n2=200, repeats=3)
p3.report("XLA bf16 gemm M=128 8192^2 (134MB)", dt, 2*8192*8192)

# (d) robust pallas stream of packed int32 (8.4MB)
from gemlite_tpu.bitpack import pack_weights_over_cols
Wq = rng.integers(0, 16, size=(4096, 4096)).astype(np.uint8)
Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)

def stream_kernel(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    s = jnp.sum(w_ref[...].astype(jnp.float32)) + x_ref[0, 0]
    acc[...] += jnp.full_like(acc, s)
    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc[...]

def run_stream(xx, bn, bk):
    return pl.pallas_call(
        stream_kernel,
        grid=(4096 // bn, 4096 // bk),
        in_specs=[pl.BlockSpec((1, 128), lambda j, k: (0, 0)),
                  pl.BlockSpec((bk // 8, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, 128), lambda j, k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xx.astype(jnp.float32), Wp)

for bn, bk in [(512, 1024), (2048, 1024), (2048, 2048), (4096, 1024)]:
    dt = timed_robust(lambda xx, bn=bn, bk=bk: run_stream(xx, bn, bk), x)
    p3.report(f"pallas stream int32 bn={bn} bk={bk} (8.4MB)", dt, 4096*4096//2)

# (e) HBM copy benchmark: y = W + 1 on 33.5MB bf16 (read+write 67MB)
dt = timed_robust(lambda xx: (W + xx[0, 0].astype(jnp.bfloat16)), x,
                  n1=100, n2=400, repeats=3)
p3.report("XLA add 33.5MB (r+w=67MB)", dt, 2*2*4096*4096)
