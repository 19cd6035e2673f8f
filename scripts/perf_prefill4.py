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
from gemlite_tpu.ops.pallas_prefill import pallas_prefill_matmul
from gemlite_tpu.config import KernelConfig
layer = GemLiteLinear(4, GS, K, N, DType.BF16, DType.BF16).pack(Wq, scales, zeros)
meta = layer.meta

M = 2048
x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
ref = np.asarray(x, np.float32) @ W_deq.T
flops = 2 * M * N * K
for bm, bn, bk in [(512, 1024, 1024), (512, 2048, 1024), (256, 1024, 2048),
                   (512, 1024, 2048), (2048, 1024, 1024), (512, 2048, 2048)]:
    cfg = KernelConfig(bm, bn, bk)
    try:
        f = lambda xx, c=cfg: pallas_prefill_matmul(
            xx, layer.W_q, layer.scales, layer.zeros, None, meta, c)
        y = f(x)
        rel = float(np.mean(np.abs(np.asarray(y, np.float32) - ref))) / \
            float(np.mean(np.abs(ref)))
        tf_ = timed_robust(f, x, n1=20, n2=80)
        print(f"bm={bm} bn={bn} bk={bk}: {tf_*1e6:8.1f} us ({flops/tf_/1e12:6.1f} TF) rel={rel:.1e}", flush=True)
    except Exception as e:
        msg = str(e); i = msg.find("Mosaic")
        print(f"bm={bm} bn={bn} bk={bk}: FAILED {msg[i:i+90] if i>=0 else msg[:90]}", flush=True)
