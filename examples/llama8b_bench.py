# SPDX-License-Identifier: Apache-2.0
"""Single-chip Llama-3-8B-scale decode/prefill benchmark (W4 quantized).

Builds the full 8B parameter set DIRECTLY as packed W4 layers (no 16 GB dense
init — random codes + scales at the right shapes; numerics are irrelevant for
timing), then measures:

  * prefill latency for a 128-token prompt,
  * steady-state decode via lax.scan over T steps inside one jit (pure device
    time — no per-step host round-trips).

W4 gs=128 8B weights ~= 4.2 GB packed + scales; fits one v5e (16 GB).

Usage: python examples/llama8b_bench.py [--layers 32] [--steps 32]
"""
import argparse
import _pathfix  # noqa: F401
import time

import numpy as np


def build_quantized_llama(cfg, W_nbits=4, group_size=128, seed=0,
                          fuse=False):
    """Random packed-W4 Llama params at full size, built layer by layer.

    The layer STRUCTURE (pack() metadata, small scales/zeros) is built on the
    host CPU backend, but the bulk buffers (packed int32 weight words, the
    embedding table) are generated directly ON the TPU with jax.random —
    uploading ~1.5 GB of random bytes through the dev tunnel (~10 MB/s) takes
    minutes, and for a timing benchmark only shapes/dtypes matter.
    """
    import jax
    import jax.numpy as jnp
    from gemlite_tpu import GemLiteLinear, DType

    cpu = jax.local_devices(backend="cpu")[0]
    tpu = jax.devices()[0]
    key = jax.random.PRNGKey(seed)

    rng = np.random.default_rng(seed)
    H, I = cfg.hidden_size, cfg.intermediate_size
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim

    def _rand_like_on_tpu(arr, k):
        # k lives on the TPU (default backend), so the bits are generated
        # there — no host->device transfer of the bulk buffer
        return jax.jit(
            lambda kk: jax.lax.bitcast_convert_type(
                jax.random.bits(kk, arr.shape, jnp.uint32), jnp.int32))(k)

    def qlayer(N, K, k):
        # run pack() on the host CPU backend (fast native packer) for the
        # metadata/mode decision tree + small scales/zeros, then swap in a
        # full-size TPU-generated random W_q buffer (packed words are
        # uniform random bits either way)
        W_q = rng.integers(0, 2**W_nbits, size=(N, K), dtype=np.uint8)
        G = N * K // group_size
        scales = (rng.uniform(0.5, 1.5, size=(G, 1)) * 2.0**-8).astype(np.float32)
        zeros = np.full((G, 1), float(2**(W_nbits - 1)), np.float32)
        with jax.default_device(cpu):
            layer = GemLiteLinear(W_nbits, group_size, K, N,
                                  DType.BF16, DType.BF16).pack(W_q, scales, zeros)
        children, aux = layer.tree_flatten()
        W_qd = _rand_like_on_tpu(children[0], k)
        rest = jax.device_put(children[1:], tpu)
        return GemLiteLinear.tree_unflatten(aux, (W_qd,) + tuple(rest))

    keys = iter(jax.random.split(key, 16))

    # One template layer per unique shape, SHARED across blocks: HBM read
    # traffic — the thing being measured — is identical whether buffers are
    # shared or unique (no inter-layer cache on TPU).
    if fuse:
        # fused projections (quantize_llama(fuse=True) layout): one wqkv
        # call (QD+2KD, H) and one gate_up call (2I, H) per block
        tmpl = {
            (QD + 2 * KD, H): qlayer(QD + 2 * KD, H, next(keys)),
            (2 * I, H): qlayer(2 * I, H, next(keys)),
            (H, I): qlayer(H, I, next(keys)),
        }
    else:
        tmpl = {
            (QD, H): qlayer(QD, H, next(keys)), (KD, H): qlayer(KD, H, next(keys)),
            (I, H): qlayer(I, H, next(keys)), (H, I): qlayer(H, I, next(keys)),
        }
    if (H, QD) not in tmpl:
        # wo is (H, QD); only materialize a separate template when the
        # shape is genuinely new (QD != H)
        tmpl[(H, QD)] = qlayer(H, QD, next(keys))
    embed = jax.jit(
        lambda kk: (jax.random.normal(kk, (cfg.vocab_size, H), jnp.float32)
                    * 0.01).astype(cfg.dtype))(next(keys))
    ln = jax.device_put(jnp.ones((H,), cfg.dtype), tpu)
    head = {
        "embed": embed,
        "ln_f": ln,
        "lm_head": qlayer(cfg.vocab_size, H, next(keys)),  # quantized LM head
    }

    blocks = []
    for li in range(cfg.num_layers):
        if fuse:
            attn = {"wqkv": tmpl[(QD + 2 * KD, H)], "wo": tmpl[(H, QD)]}
            mlp = {"gate_up": tmpl[(2 * I, H)], "down": tmpl[(H, I)]}
        else:
            attn = {"wq": tmpl[(QD, H)], "wk": tmpl[(KD, H)],
                    "wv": tmpl[(KD, H)], "wo": tmpl[(H, QD)]}
            mlp = {"gate": tmpl[(I, H)], "up": tmpl[(I, H)],
                   "down": tmpl[(H, I)]}
        blocks.append({
            "attn": attn,
            "mlp": mlp,
            "ln_attn": ln,
            "ln_mlp": ln,
        })
    head["blocks"] = blocks
    return head


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--gs", type=int, default=128)
    ap.add_argument("--fuse", action="store_true",
                    help="fused wqkv/gate_up projections (2 calls per "
                         "block group instead of 3/2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from gemlite_tpu.models import LlamaConfig, init_kv_cache
    from gemlite_tpu.models.llama import llama_forward

    cfg = LlamaConfig(vocab_size=128256, hidden_size=4096,
                      intermediate_size=14336, num_layers=args.layers,
                      num_heads=32, num_kv_heads=8, head_dim=128,
                      max_seq_len=args.max_seq)
    n_params = cfg.num_layers * (
        2 * 4096 * 4096 + 2 * 1024 * 4096 + 3 * 4096 * 14336)
    print(f"# Llama-8B-geometry W{args.nbits} gs={args.gs}"
          f"{' FUSED' if args.fuse else ''}: {cfg.num_layers} layers, "
          f"{n_params/1e9:.1f}B block params "
          f"(~{n_params*args.nbits/8/1e9:.1f} GB packed)", flush=True)

    t0 = time.perf_counter()
    params = build_quantized_llama(cfg, W_nbits=args.nbits,
                                   group_size=args.gs, fuse=args.fuse)
    print(f"# build+pack: {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, args.prompt)),
                         jnp.int32)
    kv = init_kv_cache(cfg, 1)

    from functools import partial

    @jax.jit
    def prefill(params, tokens, kv):
        logits, kv = llama_forward(params, cfg, tokens, kv=kv, cache_len=0)
        return jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32), kv

    # slope timing inside one jit: per-dispatch overhead through the dev
    # tunnel is ~30 ms, so single-call timings are meaningless
    @partial(jax.jit, static_argnames=("n",))
    def prefill_n(params, tokens, kv, n):
        def body(i, carry):
            tok, s = carry
            # data-depend the operands on the carry (dynamically always a
            # no-op) so invariant code motion cannot hoist the forward
            t_in = jnp.where(s > 1e30, tokens + 1, tokens)
            logits, _ = llama_forward(params, cfg, t_in, kv=kv, cache_len=0)
            t2 = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (t2, s + logits[0, -1, 0].astype(jnp.float32) * 1e-12)
        return lax.fori_loop(0, n, body, (tokens[:, :1], jnp.float32(0)))

    t0 = time.perf_counter()
    tok, kv = prefill(params, tokens, kv)
    int(tok[0, 0])
    t_compile = time.perf_counter() - t0
    n1, n2 = 2, 6
    for n in (n1, n2):
        r = prefill_n(params, tokens, kv, n)
        float(r[1])
    best = {}
    for n in (n1, n2) * 3:
        t0 = time.perf_counter()
        r = prefill_n(params, tokens, kv, n)
        float(r[1])
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    t_prefill = (best[n2] - best[n1]) / (n2 - n1)
    print(f"# prefill({args.prompt} tok): {t_prefill*1e3:.1f} ms = "
          f"{args.prompt/t_prefill:.0f} tok/s "
          f"(first call incl. compile {t_compile:.1f}s)", flush=True)

    @partial(jax.jit, static_argnames=("n",))
    def decode_n(params, tok, kv, start, n):
        def body(carry, _):
            tok, kv, pos = carry
            logits, kv = llama_forward(params, cfg, tok, kv=kv, cache_len=pos)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, kv, pos + 1), nxt[0, 0]
        (tok, kv, _), toks = lax.scan(body, (tok, kv, start), None, length=n)
        return tok, kv, toks

    # slope timing over two scan lengths with genuine value fetches —
    # block_until_ready is unreliable through the axon tunnel
    start = jnp.int32(args.prompt)
    n1 = max(1, args.steps // 4)
    n2 = max(args.steps, n1 + 3)   # slope needs n2 > n1
    best = {}
    for n in (n1, n2):
        _, _, t = decode_n(params, tok, kv, start, n)
        float(t.sum())  # compile + sync
    for n in (n1, n2) * 3:
        t0 = time.perf_counter()
        _, _, t = decode_n(params, tok, kv, start, n)
        float(t.sum())
        best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    per_tok = (best[n2] - best[n1]) / (n2 - n1)
    print(f"# decode: {per_tok*1e3:.2f} ms/token = {1/per_tok:.1f} tok/s "
          f"single-chip (slope over scans of {n1}/{n2})", flush=True)


if __name__ == "__main__":
    main()
