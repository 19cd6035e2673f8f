# A8W8 / A8W4 dynamic paths on TPU.
import sys
sys.argv = ["x"]
from scripts.perf_probe4 import timed_robust
import jax, jax.numpy as jnp, numpy as np

N = K = 4096
rng = np.random.default_rng(0)
from gemlite_tpu.helper import A8W8_INT8_dynamic, A8W4_HQQ_INT_dynamic, A16W8_INT8
w = (rng.normal(size=(N, K)) * 0.02).astype(np.float32)

cases = []
l8 = A8W8_INT8_dynamic().from_weights(w, None)
cases.append(("A8W8_INT8_dynamic", l8, 1))
l168 = A16W8_INT8().from_weights(w, None)
cases.append(("A16W8_INT8", l168, 1))
# A8W4: HQQ-style quantize to 4 bits gs=128
gs = 128
wg = w.reshape(-1, gs)
mn, mx = wg.min(1, keepdims=True), wg.max(1, keepdims=True)
sc = np.maximum((mx - mn) / 15, 1e-8); zp = -mn / sc
Wq = np.clip(np.round(wg / sc + zp), 0, 15).astype(np.uint8).reshape(N, K)
l84 = A8W4_HQQ_INT_dynamic().from_weights(Wq, sc, zp, None)
cases.append(("A8W4_HQQ_INT_dynamic", l84, 1))

x32 = rng.normal(size=(1, K)).astype(np.float32) * 0.5
ref = x32 @ w.T
for M in (1, 256):
    xm = jnp.asarray(np.repeat(x32, M, 0), jnp.bfloat16)
    refm = np.repeat(ref, M, 0)
    for name, layer, _ in cases:
        y = layer(xm)
        rel = float(np.mean(np.abs(np.asarray(y, np.float32) - refm))) / \
            float(np.mean(np.abs(refm)))
        n1, n2 = (100, 400) if M == 1 else (30, 120)
        dt = timed_robust(lambda xx, l=layer: l(xx), xm, n1=n1, n2=n2)
        wb = {"A8W8_INT8_dynamic": K*N, "A16W8_INT8": K*N,
              "A8W4_HQQ_INT_dynamic": K*N//2}[name]
        print(f"M={M:4d} {name:22s} {dt*1e6:8.1f} us  {wb/dt/1e9:7.1f} GB/s  rel={rel:.1e}", flush=True)
