# SPDX-License-Identifier: Apache-2.0
"""Quantization-quality parity check: NLL of a quantized model vs its dense
parent across processors (SURVEY.md section 7 step 10 — the perplexity-parity
analogue of the reference's end-to-end accuracy claims).

Runs a tiny randomly-initialized Llama on random token streams — the ABSOLUTE
numbers are meaningless, but the DELTA between dense and quantized NLL
measures dequantization fidelity end to end through the real kernels.

Usage: python examples/perplexity_parity.py
"""
import argparse
import _pathfix  # noqa: F401

import numpy as np


def nll(params, cfg, tokens):
    import jax
    import jax.numpy as jnp
    from gemlite_tpu.models.llama import loss_fn

    return float(jax.jit(lambda p, t_in, t_tgt: loss_fn(p, cfg, t_in, t_tgt))(
        params, tokens[:, :-1], tokens[:, 1:]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp
    from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama

    cfg = LlamaConfig.tiny(vocab_size=512, hidden_size=256,
                           intermediate_size=512, num_layers=4, num_heads=4,
                           num_kv_heads=2, head_dim=64, max_seq_len=128)
    dense = init_llama(cfg, seed=0)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                      (args.batches, 64)), jnp.int32)

    base = nll(dense, cfg, tokens)
    print(f"{'config':24s} {'nll':>8s} {'delta':>8s}")
    print(f"{'dense bf16':24s} {base:8.4f} {0.0:8.4f}")
    for name, kw in [
        ("W8 gs=K", dict(W_nbits=8, group_size=cfg.hidden_size)),
        ("W4 gs=64", dict(W_nbits=4, group_size=64)),
        ("W4 gs=32", dict(W_nbits=4, group_size=32)),
        ("W2 gs=32", dict(W_nbits=2, group_size=32)),
    ]:
        q = quantize_llama(dense, **kw)
        v = nll(q, cfg, tokens)
        print(f"{name:24s} {v:8.4f} {v-base:+8.4f}")


if __name__ == "__main__":
    main()
