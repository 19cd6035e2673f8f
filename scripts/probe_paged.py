# SPDX-License-Identifier: Apache-2.0
"""Probe: paged decode attention vs bucketed masked attention vs cache length.

Llama-8B attention shapes (B=8 slots, Hq=32, Hkv=8, D=128). The paged kernel
should be ~flat in the BUCKET length when slots are short (reads only each
slot's own live pages), while the masked dense path scales with the bucket.

Run on TPU: env PYTHONPATH=$PYTHONPATH:/root/repo python scripts/probe_paged.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_slope(fn, args, n1=100, n2=400, repeats=6):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(q, n):
        def body(i, qq):
            return q + fn(qq, *args) * jnp.asarray(1e-30, q.dtype)
        return jnp.sum(lax.fori_loop(0, n, body, q).astype(jnp.float32))

    q0 = args[0]
    args = args[1:]
    float(loop(q0, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(q0, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gemlite_tpu.models.paged_kv import (init_paged_kv,
                                             paged_decode_attention)
    from gemlite_tpu.models.llama import _attention

    class Cfg:
        num_layers, num_kv_heads, head_dim = 1, 8, 128
        max_seq_len = 8192
        dtype = jnp.bfloat16

    B, Hq, D = 8, 32, 128
    rng = np.random.default_rng(0)
    kv = init_paged_kv(Cfg, B, page_size=128)
    kv.pages = jnp.asarray(
        rng.normal(size=kv.pages.shape) * 0.1, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)

    print(f"{'len':>6} {'paged us':>9} {'masked us (bucket)':>19}")
    for L in (128, 512, 2048, 8192):
        lens = jnp.full((B,), L, jnp.int32)
        t_p = timed_slope(lambda qq, kv, lens: paged_decode_attention(
            qq, kv, 0, lens), (q, kv, lens))

        # bucketed masked path: attend over the first L cache entries
        k_all = kv.pages[0, 0].reshape(8, -1, 128, D)[:, :kv.table.shape[1]]
        k_all = jnp.moveaxis(k_all.reshape(8, B, -1, D), 0, 2)[:, :L]
        v_all = k_all
        mask = (jnp.arange(L)[None, :] < lens[:, None])[:, None, :]
        t_m = timed_slope(
            lambda qq, k_all, v_all: _attention(
                qq[:, None], k_all, v_all, mask)[:, 0],
            (q, k_all, v_all))
        print(f"{L:>6} {t_p*1e6:>9.1f} {t_m*1e6:>19.1f}", flush=True)

    # short slots inside a long bucket: paged should track the SLOT length
    lens = jnp.full((B,), 256, jnp.int32)
    t_p = timed_slope(lambda qq, kv, lens: paged_decode_attention(
        qq, kv, 0, lens), (q, kv, lens))
    print(f"slots@256 (bucket 8192): paged {t_p*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
