# SPDX-License-Identifier: Apache-2.0
"""Probe 4: robust timing of f_fold (fma) vs f_fold2 (subtract-first)."""
import sys
sys.argv = ["x"]  # suppress probe3 main2 guard
import importlib
p3 = importlib.import_module("scripts.perf_probe3")
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

N = p3.N; K = p3.K; GS = p3.GS


def timed_robust(fn, x, n1=300, n2=1200, repeats=4):
    @jax.jit
    def loop(x, n):
        def body(i, c):
            xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
            y = fn(xx)
            return y.astype(jnp.float32).ravel()[0] * 1e-12
        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(x, n2))
    best = {}
    for n in (n1, n2) * repeats:
        t0 = time.perf_counter()
        float(loop(x, n))
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = K // GS
    scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
    zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)

    from gemlite_tpu.bitpack import pack_weights_over_cols
    Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)

    s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
    zfold_t = jnp.asarray((-(zeros_nk + 128.0) * scales_nk).T, jnp.bfloat16)
    zoff_t = jnp.asarray(zeros_nk.T + 128.0, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    W_deq = ((Wq.reshape(N, G, GS) - zeros_nk[:, :, None]) *
             scales_nk[:, :, None]).reshape(N, K)
    ref = (np.asarray(x, np.float32) @ W_deq.T)
    allbytes = K * N // 2 + G * N * 2 * 2 + K * 2 + N * 2

    cases = []
    for bn, bk in [(512, 1024), (1024, 1024), (2048, 1024), (512, 2048),
                   (1024, 2048), (2048, 2048)]:
        cases.append(("fma   ", p3.f_fold_kernel, zfold_t, bn, bk))
        cases.append(("submul", p3.f_fold2_kernel, zoff_t, bn, bk))
    for name, kern, zz, bn, bk in cases:
        try:
            f = lambda xx, kern=kern, zz=zz, bn=bn, bk=bk: \
                p3.run_fused(kern, xx, Wp, s_t, zz, 8, bn, bk)
            y = f(x)
            err = float(jnp.mean(jnp.abs(np.asarray(y, np.float32) - ref)))
            rel = err / float(np.mean(np.abs(ref)))
            dt = timed_robust(f, x)
            p3.report(f"{name} bn={bn} bk={bk} (rel={rel:.1e})", dt, allbytes)
        except Exception as e:
            print(f"{name} bn={bn} bk={bk} FAILED: {str(e)[:90]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
