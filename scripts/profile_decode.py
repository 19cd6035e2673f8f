import sys, glob, gzip, json, time
sys.argv = ["x"]
import importlib
p3 = importlib.import_module("scripts.perf_probe3")
import jax, jax.numpy as jnp, numpy as np
from jax import lax

N=p3.N; K=p3.K; GS=p3.GS
rng = np.random.default_rng(0)
Wq = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
G = K // GS
scales_nk = rng.uniform(2.0**-11, 2.0**-9, size=(N, G)).astype(np.float32)
zeros_nk = rng.integers(0, 16, size=(N, G)).astype(np.float32)
from gemlite_tpu.bitpack import pack_weights_over_cols
Wp, _ = pack_weights_over_cols(jnp.asarray(Wq), 4, 32, transpose=True)
s_t = jnp.asarray(scales_nk.T, jnp.bfloat16)
zoff_t = jnp.asarray(zeros_nk.T + 128.0, jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

fn = lambda xx: p3.run_fused(p3.f_fold2_kernel, xx, Wp, s_t, zoff_t, 8, 2048, 1024)

@jax.jit
def loop(x, n):
    def body(i, c):
        xx = x + (c * jnp.asarray(1e-30, jnp.float32)).astype(x.dtype)
        y = fn(xx)
        return y.astype(jnp.float32).ravel()[0] * 1e-12
    return lax.fori_loop(0, n, body, jnp.float32(0))

float(loop(x, 50))  # warm
with jax.profiler.trace("/tmp/jaxtrace"):
    float(loop(x, 50))

# parse trace
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            ev.append(e)
# aggregate device ops by name
from collections import defaultdict
agg = defaultdict(lambda: [0, 0.0])
for e in ev:
    pidname = e.get("pid")
    name = e.get("name", "")
    agg[name][0] += 1
    agg[name][1] += e["dur"]
top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]
for name, (cnt, dur) in top:
    print(f"{dur/1e3:10.2f} ms  x{cnt:5d}  {name[:90]}")
