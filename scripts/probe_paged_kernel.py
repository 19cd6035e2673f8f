# SPDX-License-Identifier: Apache-2.0
"""Probe: which geometries the jax-shipped Pallas paged-attention kernel
actually lowers + runs for on a real chip, and whether its outputs match the
jnp reference. Drives the paged_decode_attention gate in models/paged_kv.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from gemlite_tpu.models.paged_kv import (PagedKV, _decode_attention_ref,
                                             paged_decode_attention)

    rng = np.random.default_rng(0)
    cases = [
        # (B, Hq, Hkv, D, page_size, pages_per_seq, label)
        (32, 32, 8, 128, 128, 4, "llama8b-32slot"),
        (8, 32, 8, 128, 128, 4, "llama8b-8slot"),
        (1, 32, 8, 128, 128, 4, "llama8b-1slot"),
        (4, 4, 2, 64, 64, 2, "tiny"),
        (8, 8, 8, 128, 128, 4, "mha-128"),
        (16, 16, 4, 64, 128, 8, "gqa-d64"),
    ]
    for B, Hq, Hkv, D, ps, pps, label in cases:
        P = B * pps + 1
        k_pages = jnp.asarray(rng.normal(size=(Hkv, P, ps, D)) * 0.3,
                              jnp.bfloat16)
        v_pages = jnp.asarray(rng.normal(size=(Hkv, P, ps, D)) * 0.3,
                              jnp.bfloat16)
        table = jnp.asarray(
            1 + np.arange(B * pps, dtype=np.int32).reshape(B, pps))
        q = jnp.asarray(rng.normal(size=(B, Hq, D)) * 0.5, jnp.bfloat16)
        lengths = jnp.asarray(rng.integers(1, ps * pps, size=B), jnp.int32)
        kv = PagedKV(jnp.stack([jnp.stack([k_pages, v_pages])]), table, ps)
        ref = np.asarray(_decode_attention_ref(
            q, k_pages, v_pages, lengths, table, ps), np.float32)
        try:
            out = jax.jit(lambda q, kv, lens: paged_decode_attention(
                q, kv, 0, lens))(q, kv, lengths)
            out = np.asarray(out, np.float32)
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"{label}: OK  maxrel={rel:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{label}: FAIL  {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
