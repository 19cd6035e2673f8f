# SPDX-License-Identifier: Apache-2.0
"""W2 quality ablation (round-5 VERDICT item 9).

PARITY.md's W2 gs=32 delta of +2.56 nll/byte was blamed on model size
without separating it from quantizer headroom. This sweep measures, on the
trained 4.85M byte-level checkpoint over the same holdout stream:

  axis 1 — group size: gs in {32, 16} (at 2 bits, halving the group doubles
           the affine-parameter budget per weight: 2+32/16 bits/weight)
  axis 2 — refit effort: iters in {12 (default), 60 (5x)}
  axis 3 — clip search: min-max window vs per-group range-shrink grid
  anchors — dense bf16, W3 gs=32 (one more bit), W4 gs=64 (PARITY row)

If the best W2 cell approaches the W3 anchor, the gap was quantizer
headroom; if all W2 cells plateau far above it, the floor is the format
(4 codes/group on a 4.85M-param model) — the measured asymptote PARITY.md
previously asserted without evidence.

Run on TPU: python -u scripts/w2_ablation.py  (appends W2_ABLATION.md)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from gemlite_tpu.importers import load_hf_llama
    from gemlite_tpu.models.llama import quantize_llama
    from perplexity_parity import batched_nll, DEFAULT_CKPT

    from gemlite_tpu.quant import quantize_int_weights

    params, cfg = load_hf_llama(DEFAULT_CKPT, dtype=jnp.bfloat16)

    def fake_quant_llama(nbits, gs, **kw):
        """Dequantized-dense model at the given format (W3 has no packed
        GemLiteLinear class — format quality is identical either way)."""
        out = dict(params)
        out["blocks"] = []
        for blk in params["blocks"]:
            nb = {"attn": {}, "mlp": {}, "ln_attn": blk["ln_attn"],
                  "ln_mlp": blk["ln_mlp"]}
            for grp in ("attn", "mlp"):
                for name, w in blk[grp].items():
                    W = np.asarray(w, np.float32)
                    Wq, s, z = quantize_int_weights(W, nbits, gs, **kw)
                    de = ((np.asarray(Wq, np.float32).reshape(-1, gs) - z)
                          * s).reshape(W.shape)
                    nb[grp][name] = jnp.asarray(de, jnp.bfloat16)
            out["blocks"].append(nb)
        return out
    with open(os.path.join(DEFAULT_CKPT, "holdout.txt"), "rb") as f:
        data = np.frombuffer(f.read(), np.uint8)
    n_tok, seq = 131072, 512
    n_rows = n_tok // seq
    tokens = jnp.asarray(
        data[: n_rows * seq].astype(np.int32).reshape(n_rows, seq))

    CLIP = (1.0, 0.95, 0.9, 0.85, 0.8, 0.7, 0.6)
    cells = [
        ("dense bf16", None),
        ("W4 gs=64 (anchor)", dict(W_nbits=4, group_size=64)),
        ("W3 gs=32 (anchor, fake-quant)", "fq3"),
        ("W2 gs=32 iters=12 (PARITY row)", dict(W_nbits=2, group_size=32)),
        ("W2 gs=32 iters=60", dict(W_nbits=2, group_size=32, iters=60)),
        ("W2 gs=32 iters=60 +clip", dict(W_nbits=2, group_size=32, iters=60,
                                         clip_grid=CLIP)),
        ("W2 gs=16 iters=12", dict(W_nbits=2, group_size=16)),
        ("W2 gs=16 iters=60 +clip", dict(W_nbits=2, group_size=16, iters=60,
                                         clip_grid=CLIP)),
    ]
    rows = []
    base = None
    for name, kw in cells:
        t0 = time.time()
        if kw is None:
            p = params
        elif kw == "fq3":
            p = fake_quant_llama(3, 32, iters=60,
                                 clip_grid=CLIP)
        else:
            p = quantize_llama(params, **kw)
        nll = batched_nll(p, cfg, tokens)
        if base is None:
            base = nll
        rows.append((name, nll))
        print(f"{name:34s} nll/byte {nll:7.4f}  delta {nll-base:+7.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    out = os.path.join(REPO, "W2_ABLATION.md")
    with open(out, "w") as f:
        f.write("# W2 quality ablation (round 5)\n\n")
        f.write("Trained 4.85M byte-level Llama (checkpoints/tiny_en_5m), "
                f"{n_tok} holdout tokens, seq {seq}. nll/byte, lower "
                "better; delta vs dense bf16.\n\n")
        f.write("| config | nll/byte | delta |\n|---|---|---|\n")
        for name, nll in rows:
            f.write(f"| {name} | {nll:.4f} | {nll-base:+.4f} |\n")
        f.write("\nSee scripts/w2_ablation.py; clip grid = "
                f"{CLIP}.\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
