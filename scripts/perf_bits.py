import sys
sys.argv = ["x"]
from scripts.perf_probe4 import timed_robust
import jax, jax.numpy as jnp, numpy as np
from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu.helper import A16W158_INT

N = K = 4096
rng = np.random.default_rng(0)
for nb, gs in [(2, 128), (1, 128)]:
    Wq = rng.integers(0, 2**nb, size=(N, K)).astype(np.uint8)
    G = N*K//gs
    scales = (rng.uniform(0.5, 1.5, size=(G,1)) * 2.0**-8).astype(np.float32)
    zeros = rng.integers(0, 2**nb, size=(G,1)).astype(np.float32)
    Wd = ((Wq.reshape(-1, gs) - zeros) * scales).reshape(N, K)
    layer = GemLiteLinear(nb, gs, K, N, DType.BF16, DType.BF16).pack(Wq, scales, zeros)
    for M in (1,):
        x = jnp.asarray(rng.normal(size=(M, K))*0.1, jnp.bfloat16)
        y = layer(x)
        ref = np.asarray(x, np.float32) @ Wd.T
        rel = float(np.mean(np.abs(np.asarray(y, np.float32) - ref))) / float(np.mean(np.abs(ref)))
        dt = timed_robust(lambda xx, l=layer: l(xx), x)
        wb = K*N*nb//8 + G*4*2
        print(f"W{nb} gs={gs} M={M}: {dt*1e6:6.1f} us  {wb/dt/1e9:6.1f} GB/s  rel={rel:.1e}", flush=True)

# BitNet ternary
w = (rng.integers(-1, 2, size=(N, K))).astype(np.float32)
layer = A16W158_INT().from_weights(w, weight_scale=np.float32(1.0))
x = jnp.asarray(rng.normal(size=(1, K))*0.1, jnp.bfloat16)
y = layer(x)
ref = np.asarray(x, np.float32) @ w.T
rel = float(np.mean(np.abs(np.asarray(y, np.float32) - ref))) / (float(np.mean(np.abs(ref))) + 1e-9)
dt = timed_robust(lambda xx, l=layer: l(xx), x)
print(f"BitNet W1.58 M=1: {dt*1e6:6.1f} us  {K*N*2//8/dt/1e9:6.1f} GB/s  rel={rel:.1e}")
