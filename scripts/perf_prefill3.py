# Prefill kernel v2 on TPU vs dense.
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
from gemlite_tpu.ops.pallas_prefill import pallas_prefill_matmul, select_prefill_config, can_use_prefill_kernel
from gemlite_tpu.config import KernelConfig
layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(Wq, scales, zeros)
Wd = jnp.asarray(W_deq.T, jnp.bfloat16)
meta = layer.meta

for M in (128, 512, 2048):
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ W_deq.T
    dense = lambda xx: jnp.dot(xx, Wd, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    n1, n2 = (50, 200) if M <= 512 else (20, 80)
    td = timed_robust(dense, x, n1=n1, n2=n2)
    flops = 2 * M * N * K
    print(f"M={M:5d}  dense {td*1e6:8.1f} us ({flops/td/1e12:6.1f} TF)", flush=True)
    for bm in (128, 256, 512):
        for bn, bk in [(512, 2048), (1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048)]:
            cfg = KernelConfig(bm, bn, bk)
            if not can_use_prefill_kernel(meta, M, N, K, cfg):
                continue
            try:
                f = lambda xx, c=cfg: pallas_prefill_matmul(
                    xx, layer.W_q, layer.scales, layer.zeros, None, meta, c)
                y = f(x)
                rel = float(np.mean(np.abs(np.asarray(y, np.float32) - ref))) / \
                    (float(np.mean(np.abs(ref))) + 1e-9)
                tf_ = timed_robust(f, x, n1=n1, n2=n2)
                print(f"  fused bm={bm} bn={bn} bk={bk}: {tf_*1e6:8.1f} us "
                      f"({flops/tf_/1e12:6.1f} TF)  vs dense {td/tf_:5.2f}x  rel={rel:.1e}",
                      flush=True)
            except Exception as e:
                msg = str(e)
                i = msg.find("Mosaic")
                print(f"  fused bm={bm} bn={bn} bk={bk}: FAILED {msg[i:i+100] if i>=0 else msg[:100]}",
                      flush=True)
