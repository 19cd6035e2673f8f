# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching serving engine for quantized models.

The reference delegates serving to vLLM/SGLang (reference README.md:171-196);
here it is a first-class, TPU-native subsystem. Design:

* **Static shapes everywhere.** A fixed pool of ``max_batch`` slots, each
  owning a stripe of a preallocated KV cache (B = max_batch, T = max_seq_len).
  Prompt lengths are padded to power-of-two buckets so the number of compiled
  programs stays bounded (the serving analogue of the kernel M-bucketing,
  reference triton_kernels/utils.py:136-174).
* **Continuous batching.** Every engine step runs ONE jitted batched decode
  over all slots (inactive slots are masked, their writes land in a scratch
  cache row region beyond their length and are never attended). When a
  sequence finishes, its slot is freed and a queued request is admitted with
  a slot-local prefill — no global re-batching, no recompilation.
* **Per-slot cache offsets** via scatter updates
  (models/llama.py llama_decode_step_batched): slots decode at different
  sequence positions inside one kernel launch.
* **Paged KV attention** (default; the TPU-native analogue of vLLM's
  PagedAttention, which the reference delegates to — reference
  README.md:171-196): KV lives in fixed-size pages addressed through a
  runtime block table (models/paged_kv.py); decode reads only each slot's
  own live pages via the Pallas paged-attention kernel, pages are handed
  out on demand from a free list and returned at slot finish, and
  ``total_pages`` can oversubscribe below the worst-case footprint.
* **Chunked prefill** (``prefill_chunk=N``): long prompts are prefilled N
  tokens per engine step at a traced cache offset, interleaved with decode
  of the other slots — a long admission no longer stalls running streams,
  and chunk processing costs exactly one compiled program.
* **Mesh-ready.** Pass a Mesh + sharded params (shard_llama): the batch axis
  can be dp-sharded and the packed weights tp-sharded; the engine only sees
  pytrees, so pjit handles both.

Sampling: greedy or temperature (jax PRNG threaded through the engine).
"""

import itertools
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["Request", "ContinuousBatchingEngine", "GenerationResult"]


@dataclass
class Request:
    prompt_tokens: Any                       # 1D int array/list
    max_new_tokens: int = 64
    temperature: float = 0.0                 # 0 => greedy
    request_id: int = field(default_factory=itertools.count().__next__)


@dataclass
class GenerationResult:
    request_id: int
    prompt_tokens: List[int]
    output_tokens: List[int]
    finish_reason: str                       # "eos" | "length"
    # serving metrics (host wall clock; see Engine.stats() for aggregates)
    ttft_s: float = 0.0                      # submit -> first token
    total_s: float = 0.0                     # submit -> finish
    decode_tps: float = 0.0                  # tokens/s after the first token


def _next_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class ContinuousBatchingEngine:
    """Slot-based continuous batching over a quantized Llama pytree."""

    def __init__(self, params, cfg, max_batch: int = 8, eos_id: Optional[int] = None,
                 prefill_buckets=(32, 64, 128, 256, 512, 1024, 2048), seed: int = 0,
                 prefill_chunk: Optional[int] = None,
                 draft: Optional[tuple] = None, spec_tokens: int = 4,
                 paged: bool = True, page_size: int = 128,
                 total_pages: Optional[int] = None,
                 prefix_cache: bool = True,
                 mesh=None, dp_axis: Optional[str] = None,
                 scan_layers: bool = False):
        from .models.llama import init_kv_cache

        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.eos_id = eos_id
        # scan-over-layers decode program (models/scan_llama): one lax.scan
        # body instead of num_layers unrolled blocks — shrinks the decode
        # HLO (and its compile time, the 8B bottleneck: 30-60 min through
        # this environment's proxied compiler) ~L-fold. The stacked packed
        # weights are read layer-by-layer INSIDE the Pallas kernel via a
        # scalar-prefetch index map (ops/pallas_scan), so per-step HBM
        # traffic matches the unrolled program. Decode only: prefill stays
        # unrolled, and the paged-attention kernel has no layer-index
        # operand yet, so scan_layers requires the dense bucketed cache.
        self.scan_layers = bool(scan_layers)
        self._stacked = None
        if scan_layers:
            if paged:
                raise ValueError(
                    "scan_layers requires paged=False (the paged-attention "
                    "kernel takes no layer-index operand yet)")
            if draft is not None:
                raise ValueError("scan_layers does not cover the "
                                 "speculative verify step; drop draft=")
            from .models.scan_llama import stack_blocks
            self._stacked = stack_blocks(params)
        # data-parallel continuous batching: slots (the batch axis of the KV
        # cache and every per-step token/length/temperature array) sharded
        # over mesh axis `dp_axis`; combine with tp-sharded params
        # (shard_llama) for 2D serving. Requires the dense bucketed cache
        # (paged=False): the paged allocator is host-side content-addressed,
        # so its pages have no stable slot->device affinity to shard over.
        self.mesh = mesh
        self.dp_axis = dp_axis
        self._dp = None
        if mesh is not None and dp_axis is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if paged:
                raise ValueError("dp-sharded batching requires paged=False")
            assert max_batch % mesh.shape[dp_axis] == 0, \
                "max_batch must divide over the dp axis"
            self._dp = {
                "kv": NamedSharding(mesh, P(None, None, dp_axis)),
                "b1": NamedSharding(mesh, P(dp_axis, None)),
                "b": NamedSharding(mesh, P(dp_axis)),
            }
        # speculative decoding: draft = (draft_params, draft_cfg) of a small
        # model sharing the tokenizer; spec_tokens = draft tokens per step
        self.draft = draft
        self.spec_tokens = spec_tokens if draft is not None else 0
        if draft is not None:
            dcfg = draft[1]
            assert dcfg.max_seq_len >= cfg.max_seq_len, \
                "draft max_seq_len must cover the target cache"
            self.draft_kv = init_kv_cache(dcfg, max_batch)
        self.buckets = tuple(b for b in sorted(prefill_buckets)
                             if b <= cfg.max_seq_len)
        if not self.buckets:
            raise ValueError(
                f"no prefill bucket fits max_seq_len={cfg.max_seq_len}; "
                f"pass prefill_buckets with at least one value <= it")
        # chunked prefill: long prompts are prefilled prefill_chunk tokens per
        # engine step, interleaved with decode of the other slots — bounds the
        # per-step latency a long admission adds (one compiled chunk program)
        self.prefill_chunk = prefill_chunk
        # paged KV (vLLM-style block tables, reference README.md:171-196):
        # pages are handed out on demand from a free list as sequences grow
        # and returned when a slot finishes; page 0 is a reserved TRASH page
        # so inactive slots' masked decode writes through stale table rows
        # can never clobber live pages. total_pages < max_batch * pages_per_
        # seq oversubscribes memory (admission then depends on actual, not
        # worst-case, sequence lengths).
        self.paged = paged
        if paged:
            from .models.paged_kv import init_paged_kv

            # largest power-of-two divisor of max_seq_len <= requested size
            page_size = min(page_size, cfg.max_seq_len)
            while cfg.max_seq_len % page_size:
                page_size //= 2
            self.page_size = page_size
            self.pages_per_seq = cfg.max_seq_len // page_size
            n_pages = (total_pages if total_pages is not None
                       else max_batch * self.pages_per_seq + 1)
            assert n_pages >= 2, "need at least the trash page + one page"
            self.kv = init_paged_kv(cfg, max_batch, page_size,
                                    total_pages=n_pages)
            self.page_table = np.zeros((max_batch, self.pages_per_seq),
                                       np.int32)     # all rows -> trash page
            self.kv = self.kv.with_table(jnp.asarray(self.page_table))
            self.free_pages: List[int] = list(range(n_pages - 1, 0, -1))
            self.slot_pages: List[List[int]] = [[] for _ in range(max_batch)]
            self._table_dirty = False
        else:
            self.kv = init_kv_cache(cfg, max_batch)
            if self._dp is not None:
                self.kv = jax.device_put(self.kv, self._dp["kv"])
        # prefix caching (vLLM-style automatic prefix sharing): full prompt
        # pages are registered under a token-content hash chain; a later
        # prompt with the same prefix attaches those pages READ-ONLY (writes
        # only ever land at cache positions >= the matched length, so no
        # copy-on-write is needed) and prefills just the remainder through
        # the chunked path. Pages are refcounted; refcount-0 cached pages
        # are reclaimed LRU when the free list runs dry. Disabled when a
        # speculative draft is attached (the dense draft cache would miss
        # the skipped prefix).
        self.use_prefix = bool(prefix_cache) and paged and draft is None
        self.prefix_cache: "OrderedDict[int, tuple]" = OrderedDict()
        # hash -> (pid, page_tokens): tokens verified on match so a
        # 64-bit hash collision can never attach another prompt's KV
        self.page_refs: Dict[int, int] = {}                  # pid -> live slots
        self.slot_shared: List[set] = [set() for _ in range(max_batch)]
        self.prefix_stats = {"hit_pages": 0, "new_pages": 0}
        self.key = jax.random.PRNGKey(seed)

        # device-resident decode-loop state: the previous step's sampled
        # tokens / advanced lens / temps / active mask as DEVICE arrays.
        # Invalidated (-> host re-upload) whenever the host scheduler changes
        # slot state: admission, chunk completion, finish, speculative burst.
        self._dev: Optional[Dict[str, Any]] = None
        self._dev_dirty = True

        # host-side slot state
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.slot_len = np.zeros(max_batch, np.int32)        # valid cache length
        self.slot_out: List[List[int]] = [[] for _ in range(max_batch)]
        self.slot_last = np.zeros(max_batch, np.int32)       # last sampled token
        self.slot_pending: List[Optional[np.ndarray]] = [None] * max_batch
        self.queue: List[Request] = []
        self.finished: List[GenerationResult] = []
        # serving metrics: per-request [submit_ts, first_token_ts] + engine
        # counters aggregated by stats()
        self._req_times: Dict[int, List[Optional[float]]] = {}
        self._counters = {"steps": 0, "decode_steps": 0, "spec_steps": 0,
                          "tokens_out": 0, "start": time.monotonic()}

        # decode attention reads only the live-KV bucket (t_active static ->
        # one compiled program per power-of-two bucket, like prefill buckets)
        self.decode_buckets = []
        b = 256
        while b < cfg.max_seq_len:
            self.decode_buckets.append(b)
            b *= 2
        self.decode_buckets.append(cfg.max_seq_len)

        # kv (and the PRNG key) are donated: the engine always reassigns
        # self.kv/self.key from the results, and without donation XLA
        # allocates + copies the multi-GB cache on every step
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(2,))
        self._prefill_chunk_jit = jax.jit(self._prefill_chunk_impl,
                                          donate_argnums=(2,))
        self._decode_jit = jax.jit(self._decode_impl,
                                   static_argnames=("t_active",),
                                   donate_argnums=(2, 4))
        if draft is not None:
            self._dprefill_jit = jax.jit(self._dprefill_impl,
                                         donate_argnums=(2,))
            self._dprefill_chunk_jit = jax.jit(self._dprefill_chunk_impl,
                                               donate_argnums=(2,))
            self._spec_jit = jax.jit(self._spec_impl,
                                     static_argnames=("gamma", "t_active"),
                                     donate_argnums=(3, 4))

    # ------------------------------------------------------------------
    # paged-KV page allocator (host side)
    # ------------------------------------------------------------------
    def _evict_prefix_pages(self) -> bool:
        """Reclaim one LRU refcount-0 prefix-cached page to the free list."""
        for h, (pid, _) in list(self.prefix_cache.items()):   # LRU first
            if self.page_refs.get(pid, 0) == 0:
                del self.prefix_cache[h]
                self.page_refs.pop(pid, None)
                self.free_pages.append(pid)
                return True
        return False

    def _ensure_pages(self, slot: int, n_tokens: int):
        """Grow the slot's page set to cover ``n_tokens`` cache positions."""
        if not self.paged:
            return
        need = -(-int(n_tokens) // self.page_size)
        own = self.slot_pages[slot]
        while len(own) < need:
            if not self.free_pages and not self._evict_prefix_pages():
                raise RuntimeError(
                    "paged KV pool exhausted — raise total_pages (the pool "
                    "is oversubscribed below the worst-case footprint)")
            p = self.free_pages.pop()
            self.page_table[slot, len(own)] = p
            own.append(p)
            self._table_dirty = True

    def _free_slot_pages(self, slot: int):
        if not self.paged or not self.slot_pages[slot]:
            return
        shared = self.slot_shared[slot]
        for pid in self.slot_pages[slot]:
            if pid in shared:
                # cached prefix page: another slot (or the cache itself, at
                # refcount 0 pending LRU eviction) may still need it
                self.page_refs[pid] = max(0, self.page_refs.get(pid, 1) - 1)
            else:
                self.free_pages.append(pid)
        self.slot_pages[slot] = []
        self.slot_shared[slot] = set()
        self.page_table[slot, :] = 0          # stale writes land in trash
        self._table_dirty = True

    # ---- prefix cache (host side) ------------------------------------
    @staticmethod
    def _chain_hashes(prompt, ps: int, n_pages: int):
        h, out = 0, []
        for i in range(n_pages):
            h = hash((h, tuple(int(t) for t in prompt[i * ps:(i + 1) * ps])))
            out.append(h)
        return out

    def _remainder_chunk(self, rem: int) -> int:
        """Padded chunk width for a prompt remainder: the remainder's bucket
        (not the largest bucket — a 44-token tail must not cost a 2048-wide
        program), or the configured fixed chunk."""
        C = self.prefill_chunk or _next_bucket(max(rem, 1), self.buckets)
        return min(C, self.buckets[-1])

    def _match_prefix(self, slot: int, prompt) -> int:
        """Attach cached pages covering the longest token-exact prompt prefix
        (full pages only; at least one token is left to prefill so the first
        sampled token's logits exist). The match is capped so the remainder's
        padded chunk writes stay inside max_seq_len — a page-aligned (not
        chunk-aligned) start could otherwise overflow the page table.
        Returns the matched token count."""
        ps = self.page_size
        limit = (len(prompt) - 1) // ps
        own = self.slot_pages[slot]
        assert not own, "prefix attach on a non-empty slot"
        for i, h in enumerate(self._chain_hashes(prompt, ps, limit)):
            entry = self.prefix_cache.get(h)
            if entry is None:
                break
            pid, page_toks = entry
            if page_toks != tuple(int(t) for t in prompt[i * ps:(i + 1) * ps]):
                break     # hash collision: contents differ, do not attach
            self.prefix_cache.move_to_end(h)                 # LRU touch
            self.page_refs[pid] = self.page_refs.get(pid, 0) + 1
            self.page_table[slot, i] = pid
            own.append(pid)
            self.slot_shared[slot].add(pid)
            self._table_dirty = True
            self.prefix_stats["hit_pages"] += 1
        # drop trailing matches until the chunked remainder fits the cache:
        # every chunk write spans the full padded width from a page-aligned
        # offset, so matched + ceil(rem / C) * C must not exceed max_seq_len
        while own:
            matched = len(own) * ps
            rem = len(prompt) - matched
            C = self._remainder_chunk(rem)
            if matched + (-(-rem // C)) * C <= self.cfg.max_seq_len:
                break
            pid = own.pop()
            self.page_table[slot, len(own)] = 0
            self.slot_shared[slot].discard(pid)
            self.page_refs[pid] = max(0, self.page_refs.get(pid, 1) - 1)
            self.prefix_stats["hit_pages"] -= 1
        return len(own) * ps

    def _register_prefix(self, slot: int, prompt):
        """After a prompt's prefill completes, publish its full pages for
        reuse (pages already attached from the cache re-register as no-ops:
        same hash chain, entry already present)."""
        if not self.use_prefix:
            return
        ps = self.page_size
        full = len(prompt) // ps
        own = self.slot_pages[slot]
        for i, h in enumerate(self._chain_hashes(prompt, ps, full)):
            if i >= len(own):
                break
            pid = own[i]
            if h in self.prefix_cache:
                continue                     # identical content cached first
            if pid in self.slot_shared[slot]:
                continue                     # attached page: already cached
            self.prefix_cache[h] = (
                pid, tuple(int(t) for t in prompt[i * ps:(i + 1) * ps]))
            self.page_refs[pid] = self.page_refs.get(pid, 0) + 1
            self.slot_shared[slot].add(pid)
            self.prefix_stats["new_pages"] += 1

    def prefix_cache_stats(self):
        """{'hit_pages', 'new_pages', 'cached_pages'} since engine start."""
        return dict(self.prefix_stats,
                    cached_pages=len(self.prefix_cache))

    def _sync_table(self):
        if self.paged and self._table_dirty:
            self.kv = self.kv.with_table(jnp.asarray(self.page_table))
            self._table_dirty = False

    # ------------------------------------------------------------------
    # jitted device functions
    # ------------------------------------------------------------------
    def _prefill_impl(self, params, tokens, kv, slot, true_len):
        """tokens (1, Lb) padded; writes the slot's cache stripe; returns
        (last-token logits (1, V), kv)."""
        from .models.llama import llama_forward

        if self.paged:
            table = kv.table
            kv1 = kv.with_table(
                jax.lax.dynamic_slice_in_dim(table, slot, 1, axis=0))
            logits, kv1 = llama_forward(params, self.cfg, tokens,
                                        kv=kv1, cache_len=0)
            kv = kv1.with_table(table)
        else:
            kv_slot = jax.lax.dynamic_slice_in_dim(kv, slot, 1, axis=2)
            logits, kv_slot = llama_forward(params, self.cfg, tokens,
                                            kv=kv_slot, cache_len=0)
            kv = jax.lax.dynamic_update_slice_in_dim(kv, kv_slot, slot, axis=2)
        last = jax.lax.dynamic_slice_in_dim(logits, true_len - 1, 1, axis=1)
        last = last[:, 0, :]
        # greedy token computed in-program: the host needs one scalar
        # download instead of a second argmax dispatch (tunnel RPCs dominate
        # admission latency; temperature>0 slots still sample host-side)
        return last, jnp.argmax(last, axis=-1).astype(jnp.int32), kv

    def _prefill_chunk_impl(self, params, tokens, kv, slot, cache_len, true_len):
        """One prompt chunk at a traced cache offset. tokens (1, C) padded;
        writes rows [cache_len, cache_len + C) of the slot's stripe (pad rows
        are overwritten by the next chunk / first decodes); returns the
        logits at the chunk's last valid position."""
        from .models.llama import llama_forward

        if self.paged:
            table = kv.table
            kv1 = kv.with_table(
                jax.lax.dynamic_slice_in_dim(table, slot, 1, axis=0))
            logits, kv1 = llama_forward(params, self.cfg, tokens,
                                        kv=kv1, cache_len=cache_len)
            kv = kv1.with_table(table)
        else:
            kv_slot = jax.lax.dynamic_slice_in_dim(kv, slot, 1, axis=2)
            logits, kv_slot = llama_forward(params, self.cfg, tokens,
                                            kv=kv_slot, cache_len=cache_len)
            kv = jax.lax.dynamic_update_slice_in_dim(kv, kv_slot, slot, axis=2)
        last = jax.lax.dynamic_slice_in_dim(logits, true_len - 1, 1, axis=1)
        last = last[:, 0, :]
        return last, jnp.argmax(last, axis=-1).astype(jnp.int32), kv

    def _dprefill_impl(self, dparams, tokens, kv, slot, true_len):
        """Draft-model slot prefill (cache only; logits discarded)."""
        from .models.llama import llama_forward

        kv_slot = jax.lax.dynamic_slice_in_dim(kv, slot, 1, axis=2)
        _, kv_slot = llama_forward(dparams, self.draft[1], tokens,
                                   kv=kv_slot, cache_len=0)
        return jax.lax.dynamic_update_slice_in_dim(kv, kv_slot, slot, axis=2)

    def _dprefill_chunk_impl(self, dparams, tokens, kv, slot, cache_len):
        from .models.llama import llama_forward

        kv_slot = jax.lax.dynamic_slice_in_dim(kv, slot, 1, axis=2)
        _, kv_slot = llama_forward(dparams, self.draft[1], tokens,
                                   kv=kv_slot, cache_len=cache_len)
        return jax.lax.dynamic_update_slice_in_dim(kv, kv_slot, slot, axis=2)

    @staticmethod
    def _spec_dist(logits, temps):
        """Per-slot proposal/verification distribution: softmax(l / T) for
        sampled slots, a one-hot argmax for greedy (T == 0) slots — the
        rejection rule then reduces exactly to greedy prefix matching."""
        logits = logits.astype(jnp.float32)
        t = jnp.maximum(temps, 1e-6)[:, None]
        soft = jax.nn.softmax(logits / t, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1],
                              dtype=jnp.float32)
        return jnp.where((temps > 0)[:, None], soft, hard)

    def _spec_impl(self, params, dparams, tokens, kv, dkv, cache_lens, temps,
                   key, gamma, t_active=None):
        """Speculative step with standard rejection sampling (Leviathan et
        al.): the draft proposes ``gamma`` tokens from its own distribution,
        the target verifies all of them in ONE forward over (B, gamma+1)
        per-slot positions; token i is accepted with prob min(1, p_i/q_i)
        and the first rejection is replaced by a sample from the residual
        (p - q)+ — so emitted tokens are distributed exactly as target-only
        sampling. Greedy slots (T == 0) use one-hot distributions, which
        reduces the rule to exact greedy prefix matching (lossless)."""
        from .models.llama import llama_decode_step_batched, llama_verify_step

        dcfg = self.draft[1]
        B = tokens.shape[0]
        drafts, q_full = [], []
        tok = tokens
        dl = cache_lens
        for _ in range(gamma):
            dlogits, dkv = llama_decode_step_batched(dparams, dcfg, tok, dkv,
                                                     dl, t_active=t_active)
            q = self._spec_dist(dlogits[:, 0], temps)         # (B, V)
            key, sub = jax.random.split(key)
            sampled = jax.random.categorical(
                sub, jnp.log(q + 1e-30), axis=-1).astype(jnp.int32)
            greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
            tok = jnp.where(temps > 0, sampled, greedy)[:, None]
            drafts.append(tok)
            q_full.append(q)
            dl = dl + 1
        # feed the LAST drafted token once more so its KV lands in the draft
        # cache: on full acceptance the next burst starts past this position
        # and would otherwise attend a zero row forever (rejected tails are
        # simply overwritten by later steps)
        _, dkv = llama_decode_step_batched(dparams, dcfg, tok, dkv, dl,
                                           t_active=t_active)
        drafts = jnp.concatenate(drafts, axis=1)              # (B, g)
        q_full = jnp.stack(q_full, axis=1)                    # (B, g, V)

        seq = jnp.concatenate([tokens, drafts], axis=1)       # (B, g+1)
        logits, kv = llama_verify_step(params, self.cfg, seq, kv, cache_lens,
                                       t_active=t_active)
        V = logits.shape[-1]
        p = self._spec_dist(logits.reshape(B * (gamma + 1), V),
                            jnp.repeat(temps, gamma + 1)
                            ).reshape(B, gamma + 1, V)        # (B, g+1, V)

        p_d = jnp.take_along_axis(p[:, :gamma], drafts[..., None],
                                  axis=2)[..., 0]             # (B, g)
        q_d = jnp.take_along_axis(q_full, drafts[..., None], axis=2)[..., 0]
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (B, gamma))
        acc = (u * q_d < p_d).astype(jnp.int32)               # u < p/q
        n_acc = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)     # (B,)

        # fix token: residual (p - q)+ at the rejection position, or the
        # target distribution itself for the bonus (all-accepted) case
        # (q padded with a zero slice at position gamma -> residual = p)
        qz = jnp.concatenate([q_full, jnp.zeros((B, 1, V), jnp.float32)], 1)
        p_at = jnp.take_along_axis(p, n_acc[:, None, None], axis=1)[:, 0]
        q_at = jnp.take_along_axis(qz, n_acc[:, None, None], axis=1)[:, 0]
        res = jnp.clip(p_at - q_at, 0.0, None)
        res = res + 1e-30
        key, sub = jax.random.split(key)
        fix_sampled = jax.random.categorical(
            sub, jnp.log(res), axis=-1).astype(jnp.int32)
        fix_greedy = jnp.argmax(res, axis=-1).astype(jnp.int32)
        fix = jnp.where(temps > 0, fix_sampled, fix_greedy)   # (B,)
        # ONE packed int32 result array: [drafts (B*g) | fix (B) | n_acc (B)]
        # — the host needs a single download per burst instead of three
        # (each forced np.asarray is a full RPC round trip here)
        packed = jnp.concatenate([drafts.reshape(-1), fix,
                                  n_acc.astype(jnp.int32)])
        return packed, kv, dkv, key

    def _decode_impl(self, params, tokens, kv, cache_lens, key, temps,
                     active, t_active=None, stacked=None):
        """One batched decode step. tokens (B, 1); cache_lens (B,);
        temps (B,); active (B,) int32 mask; t_active static live-KV bucket.
        Inactive slots are masked by the stale-row/trash-page write
        convention, not here. Returns (next_tokens (B,), kv, key,
        next_cache_lens) — the advanced lens feed the DEVICE-RESIDENT decode
        loop: between admissions/finishes the engine reuses the returned
        tokens/lens on device, so a steady decode step costs ONE dispatch +
        ONE scalar-batch download instead of re-uploading every per-slot
        array (measured 206 -> ~70 ms/step through the dev tunnel at 32
        slots; see SERVING.md)."""
        from .models.llama import llama_decode_step_batched

        # inactive slots write their k/v at their (stale) cache_lens row and
        # never advance; the row is overwritten on (re)admission.
        if stacked is not None:
            from .models.scan_llama import llama_decode_step_scan
            logits, kv = llama_decode_step_scan(stacked, params, self.cfg,
                                                tokens, kv, cache_lens,
                                                t_active=t_active)
        else:
            logits, kv = llama_decode_step_batched(
                params, self.cfg, tokens, kv, cache_lens, t_active=t_active)
        logits = logits[:, 0, :].astype(jnp.float32)          # (B, V)
        key, sub = jax.random.split(key)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
        sampled = jax.random.categorical(sub, scaled, axis=-1).astype(jnp.int32)
        nxt = jnp.where(temps > 0, sampled, greedy)
        return nxt, kv, key, cache_lens + active

    # ------------------------------------------------------------------
    # host-side scheduler
    # ------------------------------------------------------------------
    def submit(self, request: Request):
        n = int(np.asarray(request.prompt_tokens).reshape(-1).shape[0])
        if n == 0:
            raise ValueError("empty prompt")
        if n >= self.cfg.max_seq_len:
            raise ValueError(
                f"prompt length {n} >= max_seq_len {self.cfg.max_seq_len}; "
                "the cache has no room for generated tokens")
        self._req_times[request.request_id] = [time.monotonic(), None]
        self.queue.append(request)

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def _sample_first(self, req, logits, greedy=None):
        if req.temperature > 0:
            self.key, sub = jax.random.split(self.key)
            return int(jax.random.categorical(
                sub, logits.astype(jnp.float32) / req.temperature, axis=-1)[0])
        if greedy is not None:       # computed inside the prefill program
            return int(greedy[0])
        return int(jnp.argmax(logits, axis=-1)[0])

    def _admit(self):
        """Fill free slots from the queue with slot-local prefill."""
        if self.queue and any(r is None for r in self.slot_req):
            self._dev_dirty = True           # slot state about to change
        for slot in range(self.max_batch):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            prompt = np.asarray(req.prompt_tokens, np.int32).reshape(-1)
            if self.use_prefix and len(prompt) > self.page_size:
                matched = self._match_prefix(slot, prompt)
                if matched:
                    # cached prefix attached read-only; prefill only the
                    # remainder through the chunked path at offset `matched`
                    self.slot_req[slot] = req
                    self.slot_len[slot] = matched
                    self.slot_out[slot] = []
                    self.slot_pending[slot] = prompt[matched:]
                    continue
            if len(prompt) > self.buckets[-1]:
                # longer than the largest one-shot bucket: ALWAYS chunk —
                # even when prefill_chunk is set but larger than the prompt
                # (the one-shot path's padded buffer is bucket-sized)
                self.slot_req[slot] = req
                self.slot_len[slot] = 0
                self.slot_out[slot] = []
                self.slot_pending[slot] = prompt
                continue
            if self.prefill_chunk and len(prompt) > self.prefill_chunk:
                # chunked admission: claim the slot; chunks advance in step()
                self.slot_req[slot] = req
                self.slot_len[slot] = 0
                self.slot_out[slot] = []
                self.slot_pending[slot] = prompt
                continue
            Lb = _next_bucket(len(prompt), self.buckets)
            padded = np.zeros((1, Lb), np.int32)
            padded[0, :len(prompt)] = prompt
            # pad rows within the bucket are also written (then overwritten
            # by decode); cover the whole bucket
            try:
                self._ensure_pages(slot, Lb)
            except RuntimeError:
                # return the partial allocation (a later admission on this
                # slot must start from an empty page set)
                self._free_slot_pages(slot)
                if self.num_active == 0:
                    # no running slot can ever free pages: unsatisfiable
                    raise
                # oversubscribed pool dry: requeue and retry next step once
                # running slots free pages (the request must not be lost)
                self.queue.insert(0, req)
                break
            self._sync_table()
            logits, greedy, self.kv = self._prefill_jit(
                self.params, jnp.asarray(padded), self.kv,
                jnp.int32(slot), jnp.int32(len(prompt)))
            if self.draft is not None:
                self.draft_kv = self._dprefill_jit(
                    self.draft[0], jnp.asarray(padded), self.draft_kv,
                    jnp.int32(slot), jnp.int32(len(prompt)))
            tok = self._sample_first(req, logits, greedy)
            self.slot_req[slot] = req
            self.slot_len[slot] = len(prompt)
            self.slot_out[slot] = [tok]
            self.slot_last[slot] = tok
            self._mark_first_token(req)
            self._counters["tokens_out"] += 1
            self._register_prefix(slot, prompt)
            self._maybe_finish(slot, tok)

    def _advance_prefills(self):
        """Process one prompt chunk per mid-prefill slot (chunked mode, or
        auto-chunked admission of prompts longer than the largest bucket).
        The chunk width is capped at the largest bucket so chunk writes never
        exceed the cache length."""
        for slot in range(self.max_batch):
            pend = self.slot_pending[slot]
            if pend is None:
                continue
            C = self._remainder_chunk(len(pend))
            head = int(self.cfg.max_seq_len) - int(self.slot_len[slot])
            if C > head:
                # the padded chunk writes all C rows: a near-max prompt with
                # a non-dividing chunk width would overflow the cache (paged:
                # page-table IndexError; dense: clamped scatter corrupting
                # earlier rows). Pow2 floor keeps the compile count bounded.
                C = 1 << (max(head, 1).bit_length() - 1)
            chunk, rest = pend[:C], pend[C:]
            padded = np.zeros((1, C), np.int32)
            padded[0, :len(chunk)] = chunk
            self._ensure_pages(slot, int(self.slot_len[slot]) + C)
            self._sync_table()
            logits, greedy, self.kv = self._prefill_chunk_jit(
                self.params, jnp.asarray(padded), self.kv, jnp.int32(slot),
                jnp.int32(int(self.slot_len[slot])), jnp.int32(len(chunk)))
            if self.draft is not None:
                self.draft_kv = self._dprefill_chunk_jit(
                    self.draft[0], jnp.asarray(padded), self.draft_kv,
                    jnp.int32(slot), jnp.int32(int(self.slot_len[slot])))
            self.slot_len[slot] += len(chunk)
            if len(rest):
                self.slot_pending[slot] = rest
                continue
            self.slot_pending[slot] = None
            self._dev_dirty = True           # slot joins the decode batch
            req = self.slot_req[slot]
            tok = self._sample_first(req, logits, greedy)
            self.slot_out[slot] = [tok]
            self.slot_last[slot] = tok
            self._mark_first_token(req)
            self._counters["tokens_out"] += 1
            self._register_prefix(
                slot, np.asarray(req.prompt_tokens, np.int32).reshape(-1))
            self._maybe_finish(slot, tok)

    def _mark_first_token(self, req: Request):
        t = self._req_times.get(req.request_id)
        if t is not None and t[1] is None:
            t[1] = time.monotonic()

    def _maybe_finish(self, slot: int, tok: int):
        req = self.slot_req[slot]
        if req is None:
            return
        done_eos = self.eos_id is not None and tok == self.eos_id
        done_len = len(self.slot_out[slot]) >= req.max_new_tokens
        over_cap = int(self.slot_len[slot]) + len(self.slot_out[slot]) >= \
            self.cfg.max_seq_len - 1
        if done_eos or done_len or over_cap:
            now = time.monotonic()
            sub, first = self._req_times.pop(req.request_id, [now, None])
            first = first if first is not None else now
            n_out = len(self.slot_out[slot])
            self.finished.append(GenerationResult(
                request_id=req.request_id,
                prompt_tokens=list(np.asarray(req.prompt_tokens).reshape(-1)),
                output_tokens=list(self.slot_out[slot]),
                finish_reason="eos" if done_eos else "length",
                ttft_s=first - sub,
                total_s=now - sub,
                decode_tps=((n_out - 1) / (now - first)
                            if n_out > 1 and now > first else 0.0),
            ))
            self.slot_req[slot] = None
            self.slot_out[slot] = []
            self.slot_pending[slot] = None
            self._dev_dirty = True           # slot left the decode batch
            self._free_slot_pages(slot)

    def step(self):
        """Admit pending requests, advance prompt chunks, then advance every
        decoding slot one token."""
        self._counters["steps"] += 1
        self._admit()
        self._advance_prefills()
        # mid-prefill slots are not decoded; their batched-decode cache write
        # lands at slot_len (the next chunk's first row) and is overwritten
        active = np.array([
            r is not None and self.slot_pending[i] is None
            for i, r in enumerate(self.slot_req)])
        if not active.any():
            return
        tokens = jnp.asarray(self.slot_last.reshape(-1, 1))
        # position of the token being decoded: prompt_len + generated - 1
        # (slot_out already holds the token sampled from prefill)
        lens = self.slot_len + np.array(
            [max(len(o) - 1, 0) for o in self.slot_out], np.int32)
        temps = np.array([
            (r.temperature if r is not None else 0.0)
            for r in self.slot_req], np.float32)

        # speculative burst: draft attached and room for gamma+1 cache writes
        # (rejection sampling preserves the target distribution for sampled
        # slots and exact greedy for T == 0 slots)
        g = self.spec_tokens
        max_len = int(lens[active].max())
        if g and max_len + g + 1 < self.cfg.max_seq_len:
            for slot in range(self.max_batch):
                if active[slot]:
                    self._ensure_pages(slot, int(lens[slot]) + g + 1)
            self._sync_table()
            t_act = _next_bucket(max_len + g + 1, self.decode_buckets)
            packed, self.kv, self.draft_kv, self.key = \
                self._spec_jit(self.params, self.draft[0], tokens, self.kv,
                               self.draft_kv, jnp.asarray(lens),
                               jnp.asarray(temps), self.key,
                               gamma=g, t_active=t_act)
            packed = np.asarray(packed)
            B = self.max_batch
            drafts = packed[:B * g].reshape(B, g)
            fix = packed[B * g:B * g + B]
            n_acc = packed[B * g + B:]
            self._counters["spec_steps"] += 1
            self._dev_dirty = True           # spec path bypasses _dev
            for slot in range(self.max_batch):
                if not active[slot]:
                    continue
                na = int(n_acc[slot])
                emitted = [int(t) for t in drafts[slot, :na]] + [int(fix[slot])]
                for tok in emitted:
                    self.slot_out[slot].append(tok)
                    self.slot_last[slot] = tok
                    self._counters["tokens_out"] += 1
                    self._maybe_finish(slot, tok)
                    if self.slot_req[slot] is None:  # finished mid-burst
                        break
            return

        for slot in range(self.max_batch):
            if active[slot]:
                self._ensure_pages(slot, int(lens[slot]) + 1)
        self._sync_table()
        # paged decode is length-driven per slot (no bucket, no recompiles);
        # the dense cache falls back to the live-KV bucket bound
        t_act = (None if self.paged
                 else _next_bucket(max_len + 1, self.decode_buckets))
        # device-resident loop: between admissions/finishes the per-slot
        # arrays live on device (_decode_impl returns the advanced lens and
        # the sampled tokens, which ARE the next step's inputs) — a steady
        # step then costs one dispatch + one download, instead of the 4-5
        # host->device uploads that dominated through the dev tunnel
        if self._dev is not None and not self._dev_dirty:
            tokens = self._dev["tokens"]
            lens_j, temps_j, act_j = (self._dev["lens"], self._dev["temps"],
                                      self._dev["active"])
        else:
            lens_j, temps_j = jnp.asarray(lens), jnp.asarray(temps)
            act_j = jnp.asarray(active.astype(np.int32))
            if self._dp is not None:
                # batch-sharded decode: pinning the per-step inputs to the dp
                # axis forces GSPMD to run the whole forward batch-sharded
                tokens = jax.device_put(tokens, self._dp["b1"])
                lens_j = jax.device_put(lens_j, self._dp["b"])
                temps_j = jax.device_put(temps_j, self._dp["b"])
                act_j = jax.device_put(act_j, self._dp["b"])
        nxt_j, self.kv, self.key, lens_next = self._decode_jit(
            self.params, tokens, self.kv, lens_j,
            self.key, temps_j, act_j, t_active=t_act,
            stacked=self._stacked)
        self._dev = {"tokens": nxt_j[:, None], "lens": lens_next,
                     "temps": temps_j, "active": act_j}
        self._dev_dirty = False
        nxt = np.asarray(nxt_j)
        self._counters["decode_steps"] += 1
        for slot in range(self.max_batch):
            if not active[slot]:
                continue
            tok = int(nxt[slot])
            self.slot_out[slot].append(tok)
            self.slot_last[slot] = tok
            self._counters["tokens_out"] += 1
            self._maybe_finish(slot, tok)

    def stats(self) -> Dict[str, Any]:
        """Engine-level serving metrics since construction: step counts,
        emitted tokens, wall-clock throughput (host-timed; through-tunnel
        dispatch overhead is included, so treat as end-to-end numbers)."""
        c = dict(self._counters)
        elapsed = time.monotonic() - c.pop("start")
        c["elapsed_s"] = elapsed
        c["tokens_per_s"] = c["tokens_out"] / elapsed if elapsed > 0 else 0.0
        if self.paged and self.use_prefix:
            c["prefix_cache"] = self.prefix_cache_stats()
        return c

    def run(self, max_steps: int = 10_000) -> List[GenerationResult]:
        """Drive until every queued/active request finishes."""
        for _ in range(max_steps):
            if not self.queue and self.num_active == 0:
                break
            self.step()
        out, self.finished = self.finished, []
        return out

    def generate(self, prompts, max_new_tokens: int = 64,
                 temperature: float = 0.0) -> List[List[int]]:
        """Convenience: submit a batch of prompts, run to completion, return
        output token lists in prompt order."""
        reqs = [Request(prompt_tokens=p, max_new_tokens=max_new_tokens,
                        temperature=temperature) for p in prompts]
        for r in reqs:
            self.submit(r)
        by_id = {r.request_id: r for r in self.run()}
        missing = [r.request_id for r in reqs if r.request_id not in by_id]
        if missing:
            raise RuntimeError(
                f"{len(missing)} request(s) unfinished after run()'s step "
                f"budget — call run(max_steps=...) with a larger budget or "
                f"submit fewer/shorter requests")
        return [by_id[r.request_id].output_tokens for r in reqs]
