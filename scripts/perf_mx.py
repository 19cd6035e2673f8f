import sys, types
sys.argv = ["x"]
from scripts.perf_probe4 import timed_robust
import jax, jax.numpy as jnp, numpy as np

N = K = 4096
rng = np.random.default_rng(0)
w = (rng.normal(size=(N, K)) * 0.02).astype(np.float32)
from gemlite_tpu.mx import A16W4_MXFP, A4W4_MXFP_dynamic, A8W8_MXFP_dynamic, A8W4_MXFP_dynamic

def lin():
    o = types.SimpleNamespace()
    o.weight = w.copy()
    o.bias = None
    return o

for name, proc, wb in [("A16W4_MXFP", A16W4_MXFP(), K*N//2),
                       ("A8W4_MXFP_dyn", A8W4_MXFP_dynamic(), K*N//2),
                       ("A4W4_MXFP_dyn", A4W4_MXFP_dynamic(), K*N//2),
                       ("A8W8_MXFP_dyn", A8W8_MXFP_dynamic(), K*N)]:
    layer = proc.from_linear(lin(), del_orig=False)
    for M in (1, 256):
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.5, jnp.bfloat16)
        y = layer(x)
        ref = np.asarray(x, np.float32) @ w.T
        rel = float(np.mean(np.abs(np.asarray(y, np.float32) - ref))) / \
            float(np.mean(np.abs(ref)))
        n1, n2 = (100, 400) if M == 1 else (20, 80)
        dt = timed_robust(lambda xx, l=layer: l(xx), x, n1=n1, n2=n2)
        print(f"M={M:4d} {name:16s} {dt*1e6:8.1f} us  {wb/dt/1e9:7.1f} GB/s  rel={rel:.1e}", flush=True)
