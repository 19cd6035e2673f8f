# SPDX-License-Identifier: Apache-2.0
"""Paged KV cache + paged decode attention.

The reference delegates serving to vLLM (reference README.md:171-196), whose
PagedAttention stores KV in fixed-size pages addressed through per-sequence
block tables. This is the TPU-native equivalent:

* Cache layout ``(L, 2, Hkv, total_pages, page_size, D)`` — the layout the
  jax-shipped Pallas paged-attention kernel
  (jax.experimental.pallas.ops.tpu.paged_attention) reads natively.
* A real runtime block table ``(B, pages_per_seq) int32``: slots own
  arbitrary page sets handed out by the engine's free-list allocator, so
  ``total_pages`` may be smaller than ``B * pages_per_seq``
  (memory oversubscription), and freeing a slot returns its pages.
* Decode reads are O(slot's own length): the kernel walks only the pages up
  to ``lengths[b]`` — unlike bucketed masking, one long slot no longer drags
  every other slot's attention read up to its bucket.

On non-TPU backends a jnp reference (gather + masked softmax) with identical
semantics serves tests and CPU runs.
"""

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["PagedKV", "init_paged_kv", "paged_write", "paged_gather",
           "paged_decode_attention"]


class PagedKV:
    """Paged KV cache: ``pages (L, 2, Hkv, P, ps, D)`` + block table
    ``table (B, pages_per_seq) int32``. ``page_size`` is static."""

    def __init__(self, pages, table, page_size: int):
        self.pages = pages
        self.table = table
        self.page_size = page_size

    def tree_flatten(self):
        return (self.pages, self.table), self.page_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    def with_table(self, table):
        return PagedKV(self.pages, table, self.page_size)


jax.tree_util.register_pytree_node(
    PagedKV, PagedKV.tree_flatten, PagedKV.tree_unflatten)


def init_paged_kv(cfg, batch: int, page_size: int = 128,
                  total_pages: int = 0) -> PagedKV:
    """Preallocate pages + an identity block table (slot b owns pages
    ``[b*pps, (b+1)*pps)``). Pass ``total_pages < batch * pps`` to
    oversubscribe; the engine's allocator then hands out pages on demand."""
    assert cfg.max_seq_len % page_size == 0
    pps = cfg.max_seq_len // page_size
    P = total_pages or batch * pps
    pages = jnp.zeros((cfg.num_layers, 2, cfg.num_kv_heads, P, page_size,
                       cfg.head_dim), cfg.dtype)
    if P >= batch * pps:
        table = (np.arange(batch)[:, None] * pps
                 + np.arange(pps)[None, :]).astype(np.int32)
    else:
        table = np.zeros((batch, pps), np.int32)
    return PagedKV(pages, jnp.asarray(table), page_size)


def paged_write(kv: PagedKV, layer_idx: int, k, v, pos) -> PagedKV:
    """Scatter ``k``/``v`` (B, S, Hkv, D) into the pages at per-token
    positions ``pos`` (B, S) through the block table."""
    ps = kv.page_size
    pg = jnp.take_along_axis(kv.table, pos // ps, axis=1)     # (B, S) global
    off = pos % ps
    # mixed basic/advanced indexing: the scalar layer index splits the
    # advanced bundle, so the (B, S) batch dims land in FRONT of the slice
    # dims — the scatter value shape is (B, S, Hkv, D), i.e. k/v as-is
    pages = kv.pages.at[layer_idx, 0, :, pg, off].set(
        k.astype(kv.pages.dtype))
    pages = pages.at[layer_idx, 1, :, pg, off].set(
        v.astype(kv.pages.dtype))
    return PagedKV(pages, kv.table, ps)


def paged_gather(kv: PagedKV, layer_idx: int, t_active: int = 0):
    """Contiguous (B, T, Hkv, D) k/v views gathered through the block table
    (for masked multi-token reads: chunked prefill, speculative verify).
    ``t_active`` statically bounds T to a live-KV bucket."""
    ps = kv.page_size
    table = kv.table
    if t_active:
        table = table[:, : -(-t_active // ps)]
    k = kv.pages[layer_idx, 0][:, table]        # (Hkv, B, pages, ps, D)
    v = kv.pages[layer_idx, 1][:, table]
    Hkv, B, n, _, D = k.shape
    k = jnp.moveaxis(k.reshape(Hkv, B, n * ps, D), 0, 2)       # (B, T, Hkv, D)
    v = jnp.moveaxis(v.reshape(Hkv, B, n * ps, D), 0, 2)
    return k, v


def _decode_attention_ref(q, k_pages, v_pages, lengths, table, page_size):
    """jnp semantics-reference for single-token paged decode attention."""
    kv = PagedKV(jnp.stack([jnp.stack([k_pages, v_pages])]), table, page_size)
    k, v = paged_gather(kv, 0)
    B, T, Hkv, D = k.shape
    Hq = q.shape[1]
    rep = Hq // Hkv
    qr = q.reshape(B, Hkv, rep, D)
    scores = jnp.einsum("bhrd,bthd->bhrt", qr.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(D)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrt,bthd->bhrd", probs, v.astype(jnp.float32))
    return out.reshape(B, Hq, D).astype(q.dtype)


def paged_decode_attention(q, kv: PagedKV, layer_idx: int, lengths):
    """Single-token decode attention over the paged cache.

    q: (B, Hq, D); lengths: (B,) int32 valid tokens per slot (INCLUDING the
    one just written). Reads only ceil(lengths[b]/page_size) pages per slot.
    TPU: the jax-shipped Pallas paged-attention kernel; elsewhere: the jnp
    reference."""
    k_pages = kv.pages[layer_idx, 0]
    v_pages = kv.pages[layer_idx, 1]
    # real-chip lowering gate (probed on v5e, scripts/probe_paged_kernel.py):
    # the jax-shipped kernel lowers + matches the reference for head_dim
    # multiples of 128 (all Llama-8B-geometry slot counts PASS); head_dim 64
    # fails Mosaic's (8, 128) block alignment on its m/l scratch outputs.
    # Small-head models take the XLA gather reference path instead.
    if jax.default_backend() != "tpu" or q.shape[-1] % 128:
        return _decode_attention_ref(q, k_pages, v_pages, lengths, kv.table,
                                     kv.page_size)
    from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

    pps = kv.table.shape[1]
    ppcb = min(8, pps)
    while pps % ppcb:
        ppcb -= 1
    D = q.shape[-1]
    # the kernel applies no scale; fold 1/sqrt(D) into q
    qs = (q.astype(jnp.float32) * (1.0 / np.sqrt(D))).astype(q.dtype)
    return paged_attention(qs, k_pages, v_pages, lengths.astype(jnp.int32),
                           kv.table.astype(jnp.int32),
                           pages_per_compute_block=ppcb)
