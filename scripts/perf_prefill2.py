# Oracle (XLA dequant-then-dense) vs fused vs dense at prefill sizes.
import sys
sys.argv = ["x"]
from scripts.perf_probe4 import timed_robust
import jax, jax.numpy as jnp, numpy as np

N = K = 4096; GS = 128
rng = np.random.default_rng(0)
Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
G = N * K // GS
scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
zeros = rng.integers(0, 16, size=(G, 1)).astype(np.float32)
W_deq = ((Wq.reshape(-1, GS) - zeros) * scales).reshape(N, K)

from gemlite_tpu import GemLiteLinear, DType
from gemlite_tpu.ops.dispatch import _ref_kernel
layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(Wq, scales, zeros)
Wd = jnp.asarray(W_deq.T, jnp.bfloat16)
meta = layer.meta

for M in (128, 512, 2048):
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    oracle = lambda xx: _ref_kernel(xx, layer.W_q, layer.scales, layer.zeros, None, meta)
    dense = lambda xx: jnp.dot(xx, Wd, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ W_deq.T
    rel = float(jnp.mean(jnp.abs(oracle(x).astype(jnp.float32) - ref))) / \
        (float(np.mean(np.abs(ref))) + 1e-9)
    n1, n2 = (50, 200) if M <= 512 else (20, 80)
    to = timed_robust(oracle, x, n1=n1, n2=n2)
    td = timed_robust(dense, x, n1=n1, n2=n2)
    flops = 2 * M * N * K
    print(f"M={M:5d}  oracle {to*1e6:8.1f} us ({flops/to/1e12:6.1f} TF)  "
          f"dense {td*1e6:8.1f} us ({flops/td/1e12:6.1f} TF)  rel={rel:.1e}", flush=True)
