# Probe: in-kernel micro-scaled activations (channel_scale_mode 4) on TPU.
# A/B: fake-quant bf16 x through the prefill kernel (old path) vs transposed
# fp8 codes + f32 group scales in-kernel (new path), interleaved repeats in
# one process (tunnel timing rule). Also verifies numerics on real Mosaic.
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp

import gemlite_tpu
from gemlite_tpu import mx
from gemlite_tpu.dtypes import DType
from gemlite_tpu.mx import fake_quant_activations
from gemlite_tpu.quant import scale_activations_mx_transposed
from gemlite_tpu.ops.pallas_prefill import (
    pallas_prefill_matmul, select_prefill_config, can_use_prefill_kernel)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def slope_time(fn, x0, n1=100, n2=400):
    def chain(x, n):
        def body(_, c):
            return fn(c)
        return jax.lax.fori_loop(0, n, body, x)
    f1 = jax.jit(lambda v: chain(v, n1))
    f2 = jax.jit(lambda v: chain(v, n2))
    f1(x0)[0].block_until_ready(); f2(x0)[0].block_until_ready()
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); f1(x0)[0].block_until_ready()
        t1 = time.perf_counter(); f2(x0)[0].block_until_ready()
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6
        best = dt if best is None else min(best, dt)
    return best


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = N = 4096
    rng = np.random.default_rng(0)
    Wnp = rng.normal(size=(N, K)) * 0.05

    class Lin:
        weight = jnp.asarray(Wnp, jnp.float32)
        bias = None

    for name, mk in [
        ("A4W4_MXFP", lambda: mx.A4W4_MXFP_dynamic()),
        ("A8W8_MXFP", lambda: mx.A8W8_MXFP_dynamic(post_scale=False)),
    ]:
        layer = mk().from_linear(Lin(), del_orig=False)
        meta = layer.meta
        dt = DType(layer.input_dtype)
        cfg = select_prefill_config(meta, M, N, K)
        ok = can_use_prefill_kernel(meta, M, N, K, cfg, mx_x=True)
        print(f"{name} M={M} cfg={cfg} mx_ok={ok}", flush=True)
        if not ok:
            continue
        x = jnp.asarray(rng.normal(size=(M, K)) * 2.0, jnp.bfloat16)

        # correctness on real Mosaic
        x_mx = scale_activations_mx_transposed(x, dt)
        y_new = pallas_prefill_matmul(None, layer.W_q, layer.scales,
                                      layer.zeros, None, meta, cfg, x_mx=x_mx)
        xf = fake_quant_activations(x, dt)
        y_old = pallas_prefill_matmul(xf, layer.W_q, layer.scales, layer.zeros,
                                      None, meta._replace(channel_scale_mode=0),
                                      cfg)
        d = float(jnp.max(jnp.abs(y_new.astype(jnp.float32)
                                  - y_old.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(y_old.astype(jnp.float32))))
        print(f"  mosaic maxabs diff={d:.3e} rel={d/(ref+1e-9):.3e}", flush=True)

        # A/B timing: full path including activation quantization, chained
        # through a scalar of y so neither stage can be DCE'd or hoisted
        def step_old(c):
            xx, acc = c
            xfq = fake_quant_activations(xx, dt)
            y = pallas_prefill_matmul(xfq, layer.W_q, layer.scales,
                                      layer.zeros, None,
                                      meta._replace(channel_scale_mode=0), cfg)
            z = (y[0, 0].astype(jnp.float32) * 0).astype(jnp.bfloat16)
            return (xx.at[0, 0].add(z), acc + y[0, 1].astype(jnp.float32))

        def step_new(c):
            xx, acc = c
            cmx = scale_activations_mx_transposed(xx, dt)
            y = pallas_prefill_matmul(None, layer.W_q, layer.scales,
                                      layer.zeros, None, meta, cfg, x_mx=cmx)
            z = (y[0, 0].astype(jnp.float32) * 0).astype(jnp.bfloat16)
            return (xx.at[0, 0].add(z), acc + y[0, 1].astype(jnp.float32))

        c0 = (x, jnp.float32(0))
        for label, fn in (("old(fq-bf16)", step_old), ("new(fp8-T)", step_new),
                          ("old2", step_old), ("new2", step_new)):
            t = slope_time(fn, c0)
            print(f"  {label}: {t:.1f} us/iter", flush=True)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
