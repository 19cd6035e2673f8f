# SPDX-License-Identifier: Apache-2.0
"""Train a small byte-level Llama on real local English text and export it as
a genuine HF checkpoint (config.json + model.safetensors).

Why this exists: the build environment has zero network egress and ships no
pretrained checkpoints, so the real-model end-to-end validation
(examples/perplexity_parity.py, PARITY.md) trains the smallest real LM
available — a ~4.9M-param byte-level Llama on ~14 MB of genuine English text
harvested from installed-package documentation (markdown/METADATA/licenses/
copyright files). The exported checkpoint is bit-loadable by both
``transformers`` (torch) and ``gemlite_tpu.importers`` (the parity example
cross-checks the two), giving the quantization-quality evidence the reference
claims end-to-end on Llama-3 (reference README.md:14,219).

Run on the TPU (fast) or CPU (slow):
    python scripts/train_tiny_lm.py --steps 3000 --out checkpoints/tiny_en_5m
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CORPUS_GLOBS = [
    "/usr/share/common-licenses/*",
    "/usr/share/doc/*/copyright",
    "/opt/venv/lib/python3.12/site-packages/**/*.md",
    "/opt/venv/lib/python3.12/site-packages/**/METADATA",
]
HOLDOUT_BYTES = 262144


def harvest_corpus():
    """Concatenate real English text from installed docs, deterministically
    ordered/shuffled; returns (train_bytes, holdout_bytes) as uint8 arrays."""
    files = []
    for pat in CORPUS_GLOBS:
        files.extend(f for f in glob.glob(pat, recursive=True) if os.path.isfile(f))
    files = sorted(set(files))
    rng = np.random.default_rng(0)
    rng.shuffle(files)
    parts = []
    for f in files:
        try:
            with open(f, "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        txt = raw.decode("utf-8", errors="ignore")
        if len(txt) < 256:
            continue
        parts.append(txt)
    blob = "\n\n".join(parts).encode("utf-8")
    data = np.frombuffer(blob, dtype=np.uint8)
    print(f"corpus: {len(files)} files, {data.size/1e6:.1f} MB")
    assert data.size > 4 * HOLDOUT_BYTES, "corpus too small"
    return data[:-HOLDOUT_BYTES], data[-HOLDOUT_BYTES:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="checkpoints/tiny_en_5m")
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from gemlite_tpu.models import llama
    from gemlite_tpu.models.llama import LlamaConfig, init_llama
    from gemlite_tpu.importers import export_hf_llama

    # dense masked attention is cheap at S=512 and keeps the train graph
    # free of the flash kernel's bwd pass
    llama._can_use_flash = lambda q: False

    train, holdout = harvest_corpus()

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=768,
        num_layers=6, num_heads=4, num_kv_heads=2, head_dim=64,
        rope_theta=10000.0, max_seq_len=args.seq, dtype=jnp.float32,
    )
    params = init_llama(cfg, seed=0)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M, backend: {jax.default_backend()}")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=args.steps,
        end_value=args.lr * 0.1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, b2=0.95))
    opt_state = tx.init(params)

    def loss_fn(p, tokens, targets):
        logits = llama.llama_forward(p, cfg, tokens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None], axis=-1).mean()

    @jax.jit
    def step(p, o, tokens, targets):
        loss, g = jax.value_and_grad(loss_fn)(p, tokens, targets)
        updates, o = tx.update(g, o, p)
        return loss, optax.apply_updates(p, updates), o

    @jax.jit
    def eval_loss(p, tokens, targets):
        return loss_fn(p, tokens, targets)

    rng = np.random.default_rng(1)

    def batch(data, B):
        idx = rng.integers(0, data.size - args.seq - 1, size=B)
        win = data[idx[:, None] + np.arange(args.seq + 1)[None, :]].astype(np.int32)
        return jnp.asarray(win[:, :-1]), jnp.asarray(win[:, 1:])

    ho_tok, ho_tgt = batch(holdout, 32)

    t0 = time.time()
    for i in range(args.steps):
        tk, tg = batch(train, args.batch)
        loss, params, opt_state = step(params, opt_state, tk, tg)
        if i % 50 == 0 or i == args.steps - 1:
            l = float(loss)
            print(f"step {i:5d}  loss {l:.4f}  bits/byte {l/np.log(2):.3f}  "
                  f"{time.time()-t0:.0f}s", flush=True)
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            hl = float(eval_loss(params, ho_tok, ho_tgt))
            print(f"  holdout loss {hl:.4f}  bits/byte {hl/np.log(2):.3f}  "
                  f"ppl/byte {np.exp(hl):.3f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    export_hf_llama(params, cfg, args.out)  # bf16 checkpoint
    with open(os.path.join(args.out, "holdout.txt"), "wb") as f:
        f.write(holdout.tobytes())
    with open(os.path.join(args.out, "TRAINING.txt"), "w") as f:
        f.write(
            f"byte-level Llama, {n_params/1e6:.2f}M params, trained "
            f"{args.steps} steps x {args.batch}x{args.seq} tokens on "
            f"{train.size/1e6:.1f} MB of local English documentation text "
            f"(scripts/train_tiny_lm.py; backend={jax.default_backend()}).\n"
            f"final holdout bits/byte: {hl/np.log(2):.3f}\n"
            "tokenizer: raw bytes (vocab 256).\n")
    print(f"exported HF checkpoint to {args.out}")


if __name__ == "__main__":
    main()
