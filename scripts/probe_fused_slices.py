# SPDX-License-Identifier: Apache-2.0
"""Probe: where does the W4 fused-projection win go? (round-5 item 7)

Round-4 measured Llama-8B W4 --fuse as a wash (README), attributed to "slice
overhead ~= launch savings" — but that attribution was never isolated. This
probe times, at the Llama-8B decode shapes (M=1, H=4096 -> QD+2KD=6144):

  a. one fused wqkv kernel call, output consumed whole
  b. same + the three q/k/v slices + per-head reshards (the model's pattern)
  c. three separate wq/wk/wv kernel calls (the unfused pattern)

(b)-(a) isolates the slice cost; (c)-(a) the launch savings. Same for
gate_up at (2I, H). Run on TPU: python scripts/probe_fused_slices.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gemlite_tpu import GemLiteLinear, DType
    from gemlite_tpu.core import forward_functional

    rng = np.random.default_rng(0)
    H, QD, KD, I = 4096, 4096, 1024, 14336
    gs = 128
    Hq, Hkv, D = 32, 8, 128

    def pack(N, K, nbits=4):
        W_q = rng.integers(0, 2 ** nbits, size=(N, K)).astype(np.uint8)
        G = N * K // gs
        scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0 ** -8
                  ).astype(np.float32)
        zeros = rng.integers(0, 2 ** nbits, size=(G, 1)).astype(np.float32)
        return GemLiteLinear(nbits, gs, K, N, DType.BF16, DType.BF16).pack(
            W_q, scales, zeros)

    def timed(fn, args, n1=150, n2=600, repeats=5):
        @jax.jit
        def loop(x, rest, n):
            def body(i, xx):
                y = fn(xx, *rest)
                # scalar data-dependence: output shapes differ from x
                return x + (jnp.sum(y.astype(jnp.float32))
                            * 1e-30).astype(x.dtype)
            return jnp.sum(lax.fori_loop(0, n, body, x).astype(jnp.float32))
        x, rest = args[0], tuple(args[1:])
        float(loop(x, rest, n2))
        best = {}
        for n in (n1, n2) * repeats:
            t0 = time.perf_counter()
            float(loop(x, rest, n))
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
        return (best[n2] - best[n1]) / (n2 - n1)

    for nbits in (4, 2):
        print(f"=== W{nbits} ===", flush=True)
        wqkv = pack(QD + 2 * KD, H, nbits)
        wq, wk, wv = pack(QD, H, nbits), pack(KD, H, nbits), pack(KD, H, nbits)
        x = jnp.asarray(rng.normal(size=(1, H)) * 0.1, jnp.bfloat16)

        mf, tf = wqkv.meta, tuple(wqkv.get_tensor_args())
        m3 = [l.meta for l in (wq, wk, wv)]
        t3 = [tuple(l.get_tensor_args()) for l in (wq, wk, wv)]

        def fused_whole(xx, *tt):
            return forward_functional(xx, None, list(tt), mf)

        def fused_sliced(xx, *tt):
            qkv = forward_functional(xx, None, list(tt), mf)
            q = qkv[..., :QD].reshape(1, 1, Hq, D)
            k = qkv[..., QD:QD + KD].reshape(1, 1, Hkv, D)
            v = qkv[..., QD + KD:].reshape(1, 1, Hkv, D)
            # consume all three so nothing dead-codes; sum keeps shapes tiny
            return (q.sum(axis=2) + k.sum(axis=2) + v.sum(axis=2)).reshape(1, D)

        def unfused(xx, *tt):
            q = forward_functional(xx, None, list(tt[0]), m3[0])
            k = forward_functional(xx, None, list(tt[1]), m3[1])
            v = forward_functional(xx, None, list(tt[2]), m3[2])
            q = q.reshape(1, 1, Hq, D)
            k = k.reshape(1, 1, Hkv, D)
            v = v.reshape(1, 1, Hkv, D)
            return (q.sum(axis=2) + k.sum(axis=2) + v.sum(axis=2)).reshape(1, D)

        a = timed(fused_whole, (x,) + tf)
        b = timed(fused_sliced, (x,) + tf)
        c = timed(unfused, (x, t3[0], t3[1], t3[2]))
        print(f"  wqkv fused whole : {a*1e6:8.2f} us", flush=True)
        print(f"  wqkv fused+slices: {b*1e6:8.2f} us  (slices add "
              f"{(b-a)*1e6:+.2f})", flush=True)
        print(f"  wq/wk/wv separate: {c*1e6:8.2f} us  (fusion saves "
              f"{(c-b)*1e6:+.2f} net)", flush=True)

        gu = pack(2 * I, H, nbits)
        g1, u1 = pack(I, H, nbits), pack(I, H, nbits)
        mg, tg = gu.meta, tuple(gu.get_tensor_args())
        mg1, mu1 = g1.meta, u1.meta
        tg1, tu1 = tuple(g1.get_tensor_args()), tuple(u1.get_tensor_args())

        def gu_whole(xx, *tt):
            return forward_functional(xx, None, list(tt), mg)

        def gu_sliced(xx, *tt):
            z = forward_functional(xx, None, list(tt), mg)
            g, u = z[..., :I], z[..., I:]
            return (jax.nn.silu(g.astype(jnp.float32))
                    * u.astype(jnp.float32)).astype(jnp.bfloat16)[:, :D]

        def gu_unfused(xx, tga, tua):
            g = forward_functional(xx, None, list(tga), mg1)
            u = forward_functional(xx, None, list(tua), mu1)
            return (jax.nn.silu(g.astype(jnp.float32))
                    * u.astype(jnp.float32)).astype(jnp.bfloat16)[:, :D]

        a = timed(gu_whole, (x,) + tg)
        b = timed(gu_sliced, (x,) + tg)
        c = timed(gu_unfused, (x, tg1, tu1))
        print(f"  gate_up whole    : {a*1e6:8.2f} us", flush=True)
        print(f"  gate_up + slices : {b*1e6:8.2f} us  (slices add "
              f"{(b-a)*1e6:+.2f})", flush=True)
        print(f"  gate/up separate : {c*1e6:8.2f} us  (fusion saves "
              f"{(c-b)*1e6:+.2f} net)", flush=True)
        del wqkv, wq, wk, wv, gu, g1, u1


if __name__ == "__main__":
    main()
