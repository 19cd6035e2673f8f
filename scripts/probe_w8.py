# SPDX-License-Identifier: Apache-2.0
"""A16W8 decode plane-build A/B: which byte->bf16 unpack strategy is fastest
on a real TPU at the channel-wise W8 decode shape (4096x4096, gs=K, M=1)?

All variants stream the SAME packed byte volume (16.8 MB) through the same
grid/block structure as the shipped decode kernel (bn=1024, bk=4096) and do
one raw dot per block, so the only difference is the plane build:

  nibble_pair  - shipped _w8_planes: 2 halfword planes, each byte built from
                 two magic-bitcast nibble planes (hi*16 - 2176 + lo)
  byte_convert - 4 full-lane byte planes via (w>>8j & 0xFF).astype(bf16)
                 (sitofp + truncf; no magic)
  f32_magic    - 4 full-lane byte planes via f32 exponent trick
                 (|0x4B000000 bitcast f32, -2^23), converted to bf16
  f32_dot      - f32_magic planes kept in f32, dot runs in f32
  stream_only  - same blocks, plane build skipped (reduce raw words): the
                 streaming ceiling for this access pattern

Usage: python scripts/probe_w8.py [--quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from bench import timed_slopes

    quick = "--quick" in sys.argv
    n1, n2 = (100, 400) if quick else (200, 800)

    N = K = 4096
    bn, bk = 1024, 4096
    rows = bk // 4            # int32 word rows per block
    MAGIC16 = jnp.int32(0x43004300)

    rng = np.random.default_rng(0)
    Wq = jnp.asarray(rng.integers(0, 2**32, size=(rows, N), dtype=np.uint64)
                     .astype(np.int64).astype(np.int64) - 2**31, jnp.int32)
    x = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((1, N)) * 0.01 + 1, jnp.float32)

    def make(variant):
        def kern(x_ref, w_ref, s_ref, o_ref):
            w = w_ref[...]
            if variant == "nibble_pair":
                planes = []
                for j in range(2):
                    lo = pltpu.bitcast(((w >> (8 * j)) & 0x000F000F) | MAGIC16,
                                       jnp.bfloat16)
                    hi = pltpu.bitcast(((w >> (8 * j + 4)) & 0x000F000F) | MAGIC16,
                                       jnp.bfloat16)
                    planes.append((hi * jnp.bfloat16(16.0)
                                   - jnp.bfloat16(2176.0)) + lo)
                bg = jnp.stack(planes, axis=0).reshape(8, 512, bn)
            elif variant == "byte_convert":
                planes = [((w >> (8 * j)) & 0xFF).astype(jnp.bfloat16)
                          for j in range(4)]
                bg = jnp.stack(planes, axis=0).reshape(8, 512, bn)
            elif variant in ("f32_magic", "f32_dot"):
                planes = [
                    pltpu.bitcast(((w >> (8 * j)) & 0xFF) | 0x4B000000,
                                  jnp.float32) - jnp.float32(2 ** 23)
                    for j in range(4)
                ]
                if variant == "f32_magic":
                    planes = [p.astype(jnp.bfloat16) for p in planes]
                bg = jnp.stack(planes, axis=0).reshape(8, 512, bn)
            else:  # stream_only
                o_ref[...] = (jnp.sum(w.astype(jnp.float32))
                              + jnp.sum(x_ref[...].astype(jnp.float32))
                              )[None, None].astype(jnp.bfloat16) \
                    * s_ref[0, :1].astype(jnp.bfloat16)
                return
            xg = x_ref[...]                       # (8, 1, 512)
            if variant == "f32_dot":
                xg = xg.astype(jnp.float32)
            raw = jax.lax.dot_general(
                xg, bg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (8, 1, bn)
            acc = jnp.sum(raw, axis=0)
            o_ref[...] = (acc * s_ref[...].astype(jnp.float32)
                          ).astype(jnp.bfloat16)

        grid = (N // bn,)
        if variant == "stream_only":
            out_spec = pl.BlockSpec((1, 1), lambda j: (0, 0),
                                    memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((1, 1), jnp.bfloat16)
        else:
            out_spec = pl.BlockSpec((1, bn), lambda j: (0, j),
                                    memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((1, N), jnp.bfloat16)
        f = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, 1, 512), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn) if variant != "stream_only" else (1, N),
                             (lambda j: (0, j)) if variant != "stream_only"
                             else (lambda j: (0, 0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=oshape,
        )

        def run(xx):
            out = f(xx.reshape(1, 8, 512).transpose(1, 0, 2), Wq, s)
            return out[:, :K] if out.shape[1] >= K else \
                jnp.pad(out, ((0, 0), (0, K - out.shape[1])))

        return run

    fns = {}
    for v in ("stream_only", "nibble_pair", "byte_convert", "f32_magic",
              "f32_dot"):
        try:
            r = make(v)
            jax.block_until_ready(r(x))
            fns[v] = (r, x)
        except Exception as e:  # noqa: BLE001 - probe: report and move on
            print(f"{v:<14s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    dts = timed_slopes(fns, n1, n2)
    nbytes = rows * N * 4 + N * 4 + K * 2
    for v, dt in dts.items():
        print(f"{v:<14s} {dt*1e6:8.2f} us  {nbytes/dt/1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
