# SPDX-License-Identifier: Apache-2.0
"""Llama-3-style transformer built on quantized GemLite linears.

The reference delegates model integration to vLLM/SGLang/gpt-fast
(reference README.md:171-196); here the model family is first-class and
TPU-native: a pure-pytree functional model (params dict + static config),
jit/pjit-friendly, with

  * packed low-bit linears (any processor) for attention + MLP,
  * GQA attention with a preallocated KV cache (static shapes; decode uses
    dynamic_update_slice),
  * tensor-parallel sharding of the packed weights over a Mesh (column-
    parallel q/k/v + gate/up, row-parallel o + down — one psum per block),
  * a QLoRA-style train step: frozen packed weights, gradients to norms,
    embeddings and lm_head via the straight-through custom VJP.
"""

from dataclasses import dataclass
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import GemLiteLinear
from ..autograd import apply_linear
from ..helper import _warmup_quantize

__all__ = [
    "LlamaConfig", "init_llama", "quantize_llama", "shard_llama",
    "llama_forward", "llama_prefill", "llama_decode_step",
    "llama_decode_step_batched", "llama_verify_step",
    "init_kv_cache", "train_step",
]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llama3_8b(**kw):
        return LlamaConfig(**kw)

    @staticmethod
    def tiny(**kw):
        base = dict(vocab_size=512, hidden_size=256, intermediate_size=512,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
                    max_seq_len=128)
        base.update(kw)
        return LlamaConfig(**base)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def init_llama(cfg: LlamaConfig, seed: int = 0) -> Dict:
    """Random float params as a plain dict pytree (dense jnp weights)."""
    rng = np.random.default_rng(seed)
    H, I = cfg.hidden_size, cfg.intermediate_size
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim

    def mat(n, k, std=0.02):
        return jnp.asarray(rng.normal(size=(n, k)) * std, cfg.dtype)

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "attn": {"wq": mat(QD, H), "wk": mat(KD, H), "wv": mat(KD, H),
                     "wo": mat(H, QD)},
            "mlp": {"gate": mat(I, H), "up": mat(I, H), "down": mat(H, I)},
            "ln_attn": jnp.ones((H,), cfg.dtype),
            "ln_mlp": jnp.ones((H,), cfg.dtype),
        })
    return {
        "embed": mat(cfg.vocab_size, H, std=0.01),
        "blocks": blocks,
        "ln_f": jnp.ones((H,), cfg.dtype),
        "lm_head": mat(cfg.vocab_size, H, std=0.01),
    }


_LINEAR_KEYS = (("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
                ("mlp", "gate"), ("mlp", "up"), ("mlp", "down"))


def quantize_llama(params: Dict, processor=None, W_nbits: int = 4,
                   group_size: int = 128, quantize_lm_head: bool = False,
                   fuse: bool = False, dtype=jnp.bfloat16,
                   **quant_kwargs) -> Dict:
    """Replace every block linear (and optionally lm_head) with a packed
    GemLiteLinear via `processor.from_weights` (defaults to HQQ-style
    asymmetric grouped quantization at the given bit width).

    ``fuse=True`` concatenates q/k/v into ONE ``wqkv`` layer and gate/up into
    ONE ``gate_up`` layer before quantizing (quantization groups run along K
    within each output row, so fused quantization is bit-identical to
    separate quantization). One wide kernel call replaces three/two narrow
    ones — at decode the per-call fixed cost (grid setup, metadata streams)
    is amortized over 2-3x the output columns, which is exactly where
    sub-nibble (W2/W1) decode is overhead-bound. The wider N also gives the
    MXU/VPU more parallel work per launch. (GPU analogue: vLLM/TGI fused
    QKVParallelLinear; the reference delegates model surgery to those
    frameworks, here the model family is first-class.)"""
    from ..helper import A16Wn_HQQ_INT

    if processor is None:
        # dtype=bf16 (the model's activation dtype) marks the packed metas
        # A16 — the decode/prefill Pallas kernels' eligible configuration.
        # The previous default inferred FP32 from the float32 scale arrays,
        # which silently routed every model linear through the dense-
        # fallback oracle (itemsize>2 fails can_use_decode_kernel); scales
        # stored in the model dtype matches the reference's A16W4 helpers
        # (reference helper.py keeps scales in the torch model dtype).
        processor = A16Wn_HQQ_INT(W_nbits=W_nbits, dtype=dtype)

    def q(w):
        w = np.asarray(w, dtype=np.float32)
        if hasattr(processor, "from_linear") and hasattr(processor, "mx_fp8_dtype"):
            # MXFP/NVFP processors own their codebook quantizer — feed them
            # float weights through the same path from_linear uses
            class _W:  # minimal linear-like shim
                weight = w
                bias = None
            return processor.from_linear(_W(), del_orig=False)
        if hasattr(processor, "W_nbits") and processor.W_nbits is not None:
            return _warmup_quantize(processor, w, group_size, **quant_kwargs)
        return processor.from_weights(w, None)

    out = dict(params)
    out["blocks"] = []
    for blk in params["blocks"]:
        nb = {"attn": dict(blk["attn"]), "mlp": dict(blk["mlp"]),
              "ln_attn": blk["ln_attn"], "ln_mlp": blk["ln_mlp"]}
        if fuse:
            a, m = blk["attn"], blk["mlp"]
            wqkv = np.concatenate([np.asarray(a["wq"], np.float32),
                                   np.asarray(a["wk"], np.float32),
                                   np.asarray(a["wv"], np.float32)], axis=0)
            gate_up = np.concatenate([np.asarray(m["gate"], np.float32),
                                      np.asarray(m["up"], np.float32)], axis=0)
            nb["attn"] = {"wqkv": q(wqkv), "wo": q(a["wo"])}
            nb["mlp"] = {"gate_up": q(gate_up), "down": q(m["down"])}
        else:
            for grp, name in _LINEAR_KEYS:
                nb[grp][name] = q(blk[grp][name])
        out["blocks"].append(nb)
    if quantize_lm_head:
        out["lm_head"] = q(params["lm_head"])
    return out


def shard_llama(params: Dict, mesh: Mesh, axis: str = "tp") -> Dict:
    """Apply tensor-parallel NamedShardings to a (quantized or dense) model:
    q/k/v/gate/up column-sharded (N over tp), o/down row-sharded (K over tp),
    embeddings/lm_head sharded over vocab."""
    col, row = P(None, axis), P(axis, None)

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec)) if a is not None else None

    def put_layer(layer, mode):
        if isinstance(layer, GemLiteLinear):
            wspec = col if mode == "column" else row
            mspec_col = P(None, axis)
            if mode == "column":
                mspec = mspec_col
            else:  # grouped meta splits over K; channel-wise meta replicates
                mspec = (row if (layer.scales is not None and layer.scales.ndim == 2
                                 and layer.scales.shape[0] > 1) else P())
            W_q, scales, zeros, bias = layer.W_q, layer.scales, layer.zeros, layer.bias
            zspec = (P() if (zeros is None or zeros.ndim == 0)
                     else mspec)
            return GemLiteLinear.tree_unflatten(
                layer.meta,
                (put(W_q, wspec),
                 put(scales, mspec if mode == "row" else mspec_col),
                 put(zeros, zspec),
                 put(bias, P(axis) if mode == "column" else P())),
            )
        # dense (N, K) matrix: column-parallel shards the output dim N
        # (dim 0), row-parallel the reduction dim K (dim 1) — note this is
        # TRANSPOSED vs the packed (K//e, N) layout above
        return put(layer, P(axis, None) if mode == "column" else P(None, axis))

    out = dict(params)
    out["embed"] = put(params["embed"], P(axis, None))
    out["lm_head"] = put_layer(params["lm_head"], "column") \
        if isinstance(params["lm_head"], GemLiteLinear) else put(params["lm_head"], P(axis, None))
    out["ln_f"] = put(params["ln_f"], P())
    out["blocks"] = []
    for blk in params["blocks"]:
        if "wqkv" in blk["attn"]:
            # fused projections: still column-parallel over the fused N;
            # GSPMD reshards the post-matmul q/k/v (gate/up) slices as needed
            attn = {"wqkv": put_layer(blk["attn"]["wqkv"], "column"),
                    "wo": put_layer(blk["attn"]["wo"], "row")}
            mlp = {"gate_up": put_layer(blk["mlp"]["gate_up"], "column"),
                   "down": put_layer(blk["mlp"]["down"], "row")}
        else:
            attn = {
                "wq": put_layer(blk["attn"]["wq"], "column"),
                "wk": put_layer(blk["attn"]["wk"], "column"),
                "wv": put_layer(blk["attn"]["wv"], "column"),
                "wo": put_layer(blk["attn"]["wo"], "row"),
            }
            mlp = {
                "gate": put_layer(blk["mlp"]["gate"], "column"),
                "up": put_layer(blk["mlp"]["up"], "column"),
                "down": put_layer(blk["mlp"]["down"], "row"),
            }
        nb = {
            "attn": attn,
            "mlp": mlp,
            "ln_attn": put(blk["ln_attn"], P()),
            "ln_mlp": put(blk["ln_mlp"], P()),
        }
        out["blocks"].append(nb)
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _rms_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _apply(layer, x):
    """Dense matrix or quantized layer, differentiable either way."""
    if isinstance(layer, GemLiteLinear):
        return apply_linear(layer, x)
    return x @ layer.T.astype(x.dtype)


def _rope(x, positions, theta):
    """x: (B, S, H, D); positions: (B, S)."""
    D = x.shape[-1]
    half = D // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, half)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1).astype(x.dtype)


def init_kv_cache(cfg: LlamaConfig, batch: int):
    shape = (cfg.num_layers, 2, batch, cfg.max_seq_len, cfg.num_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, cfg.dtype)


def _attention(q, k, v, mask):
    """q: (B, S, Hq, D); k/v: (B, T, Hkv, D); GQA by head-group repeat."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    q = q.reshape(B, S, Hkv, rep, D)
    scores = jnp.einsum("bshrd,bthd->bhrst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(D)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrst,bthd->bshrd", probs, v.astype(jnp.float32))
    return out.reshape(B, S, Hq, D).astype(v.dtype)


def _can_use_flash(q) -> bool:
    """Prefill flash-attention gate: TPU backend, flash-friendly shapes."""
    B, S, Hq, D = q.shape
    return (jax.default_backend() == "tpu"
            and S >= 256 and S % 128 == 0
            and D in (64, 128, 256))


def _attention_flash_causal(q, k, v):
    """Causal prefill attention via the Pallas TPU flash kernel (jax-shipped,
    jax.experimental.pallas.ops.tpu.flash_attention) — O(S) memory instead of
    materializing (B, H, S, S) scores. GQA handled by kv head repeat."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # (B, S, H, D) -> (B, H, S, D); keep the model dtype (bf16) — the kernel
    # accumulates in f32 internally, and an f32 upcast would quadruple the
    # HBM bytes the O(S) flash path exists to save
    qt = q.swapaxes(1, 2)
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2).astype(kt.dtype)
    out = flash_attention(qt, kt, vt, causal=True, sm_scale=1.0 / np.sqrt(D))
    return out.swapaxes(1, 2).astype(v.dtype)


def _block_forward(blk, cfg, x, positions, kv, layer_idx, cache_len,
                   t_active=None):
    """x: (B, S, H). kv: full cache (L, 2, B, T, Hkv, D) or None (no cache).
    cache_len: length of valid cache BEFORE this call (decode offset).
    t_active: STATIC bound on the live cache length — decode attention reads
    only kv[:, :t_active] (the serving engine passes the max live length
    rounded to a bucket, so per-step attention cost tracks the live KV
    instead of max_seq_len)."""
    B, S, H = x.shape
    h = _rms_norm(x, blk["ln_attn"], cfg.norm_eps)
    QD = cfg.num_heads * cfg.head_dim
    KD = cfg.num_kv_heads * cfg.head_dim
    if "wqkv" in blk["attn"]:
        qkv = _apply(blk["attn"]["wqkv"], h)
        q, k, v = (qkv[..., :QD], qkv[..., QD:QD + KD], qkv[..., QD + KD:])
    else:
        q = _apply(blk["attn"]["wq"], h)
        k = _apply(blk["attn"]["wk"], h)
        v = _apply(blk["attn"]["wv"], h)
    q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    from .paged_kv import PagedKV, paged_write, paged_gather, \
        paged_decode_attention
    attn = None
    if isinstance(kv, PagedKV):
        # paged cache (serving): scatter writes through the block table;
        # single-token decode reads only each slot's own live pages
        per_slot = hasattr(cache_len, "ndim") and jnp.ndim(cache_len) == 1
        if per_slot:
            pos = cache_len[:, None] + jnp.arange(S)[None, :]
        else:
            pos = cache_len + jnp.arange(S)[None, :]
            pos = jnp.broadcast_to(pos, (B, S))
        kv = paged_write(kv, layer_idx, k, v, pos)
        is_prefill = S > 1 and isinstance(cache_len, int) and cache_len == 0
        if is_prefill and _can_use_flash(q):
            attn = _attention_flash_causal(q, k, v).reshape(B, S, -1)
        elif S == 1 and per_slot:
            attn = paged_decode_attention(
                q[:, 0], kv, layer_idx,
                (cache_len + 1).astype(jnp.int32)).reshape(B, 1, -1)
        else:
            # multi-token at a cache offset (chunked prefill, speculative
            # verify): masked attention over the gathered live bucket
            k_all, v_all = paged_gather(kv, layer_idx, t_active or 0)
            T = k_all.shape[1]
            t_idx = jnp.arange(T)[None, None, :]
            s_idx = pos[:, :, None]
            mask = jnp.broadcast_to(t_idx <= s_idx, (B, S, T))
            attn = _attention(q, k_all, v_all, mask).reshape(B, S, -1)
    elif kv is not None:
        per_slot = hasattr(cache_len, "ndim") and jnp.ndim(cache_len) == 1
        if per_slot:
            # continuous-batching decode / speculative verify: S >= 1 tokens
            # written at per-slot cache offsets
            bidx = jnp.arange(B)[:, None]
            pos = cache_len[:, None] + jnp.arange(S)[None, :]
            kv = kv.at[layer_idx, 0, bidx, pos].set(k.astype(kv.dtype))
            kv = kv.at[layer_idx, 1, bidx, pos].set(v.astype(kv.dtype))
        else:
            kv = jax.lax.dynamic_update_slice(
                kv, k[None, None].astype(kv.dtype), (layer_idx, 0, 0, cache_len, 0, 0))
            kv = jax.lax.dynamic_update_slice(
                kv, v[None, None].astype(kv.dtype), (layer_idx, 1, 0, cache_len, 0, 0))
        k_all, v_all = kv[layer_idx, 0], kv[layer_idx, 1]
        if t_active is not None and t_active < k_all.shape[1]:
            # static slice: attention reads only the live-KV bucket
            k_all = k_all[:, :t_active]
            v_all = v_all[:, :t_active]
        T = k_all.shape[1]
        t_idx = jnp.arange(T)[None, None, :]
        if per_slot:
            s_idx = cache_len[:, None, None] + jnp.arange(S)[None, :, None]
        else:
            s_idx = cache_len + jnp.arange(S)[None, :, None]
        mask = jnp.broadcast_to(t_idx <= s_idx, (B, S, T))
    else:
        k_all, v_all = k, v
        t_idx = jnp.arange(S)[None, None, :]
        s_idx = jnp.arange(S)[None, :, None]
        mask = jnp.broadcast_to(t_idx <= s_idx, (B, S, S))

    if attn is None:
        # flash path requires a statically-known zero cache offset (causal)
        is_prefill = (kv is None) or (S > 1 and isinstance(cache_len, int)
                                      and cache_len == 0)
        if is_prefill and _can_use_flash(q):
            # cache_len == 0 on the prefill path: causal over the first S
            # cache entries == causal over k/v directly (tail is masked)
            attn = _attention_flash_causal(q, k, v).reshape(B, S, -1)
        else:
            attn = _attention(q, k_all, v_all, mask).reshape(B, S, -1)
    x = x + _apply(blk["attn"]["wo"], attn)

    h = _rms_norm(x, blk["ln_mlp"], cfg.norm_eps)
    if "gate_up" in blk["mlp"]:
        gu = _apply(blk["mlp"]["gate_up"], h)
        I = gu.shape[-1] // 2
        g, u = gu[..., :I], gu[..., I:]
    else:
        g = _apply(blk["mlp"]["gate"], h)
        u = _apply(blk["mlp"]["up"], h)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    x = x + _apply(blk["mlp"]["down"], h)
    return x, kv


def llama_forward(params, cfg: LlamaConfig, tokens, kv=None, cache_len=0,
                  positions=None, sequence_parallel_axis=None, t_active=None):
    """tokens (B, S) -> logits (B, S, V). With kv, updates the cache at
    cache_len and attends over it (prefill: cache_len=0; decode: S==1).

    sequence_parallel_axis: mesh axis name for sequence parallelism — the
    residual stream between blocks is constrained to be sharded over S on
    that axis; XLA then turns the TP all-reduces into reduce-scatter +
    all-gather pairs around each block (Megatron-SP), shrinking both the
    activation footprint and the collective volume for long sequences."""
    B, S = tokens.shape
    if positions is None:
        # cache_len may be scalar or per-slot (B,): align it against B,
        # never against S (a (B,)+(1,S) broadcast would misassign offsets)
        off = jnp.asarray(cache_len, jnp.int32)
        if off.ndim == 1:
            off = off[:, None]
        positions = off + jnp.arange(S, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, (B, S))
    x = params["embed"][tokens]

    def sp(h):
        if sequence_parallel_axis is None:
            return h
        return jax.lax.with_sharding_constraint(
            h, P(None, sequence_parallel_axis, None))

    x = sp(x)
    for i, blk in enumerate(params["blocks"]):
        x, kv = _block_forward(blk, cfg, x, positions, kv, i, cache_len,
                               t_active=t_active)
        x = sp(x)
    x = _rms_norm(x, params["ln_f"], cfg.norm_eps)
    logits = _apply(params["lm_head"], x)
    return (logits, kv) if kv is not None else logits


def llama_prefill(params, cfg, tokens, kv):
    return llama_forward(params, cfg, tokens, kv=kv, cache_len=0)


def llama_decode_step(params, cfg, token, kv, cache_len):
    """token (B, 1); cache_len traced int32 -> (logits (B, 1, V), kv)."""
    return llama_forward(params, cfg, token, kv=kv, cache_len=cache_len)


def llama_verify_step(params, cfg, tokens, kv, cache_lens, t_active=None):
    """Speculative verification: tokens (B, S) = [last_accepted, draft_0..g-1]
    decoded in ONE forward at per-slot offsets; logits (B, S, V) give the
    target model's next-token distribution after every prefix."""
    B, S = tokens.shape
    positions = cache_lens[:, None] + jnp.arange(S)[None, :].astype(jnp.int32)
    return llama_forward(params, cfg, tokens, kv=kv, cache_len=cache_lens,
                         positions=positions, t_active=t_active)


def llama_decode_step_batched(params, cfg, token, kv, cache_lens,
                              t_active=None):
    """Continuous-batching decode: token (B, 1), cache_lens (B,) int32 —
    every slot advances by one token at its own cache offset. t_active (a
    STATIC int) bounds the attention read to the live-KV bucket."""
    positions = cache_lens[:, None].astype(jnp.int32)
    return llama_forward(params, cfg, token, kv=kv, cache_len=cache_lens,
                         positions=positions, t_active=t_active)


# ---------------------------------------------------------------------------
# Training (QLoRA-style: frozen packed weights, train norms/embed/lm_head)
# ---------------------------------------------------------------------------

def loss_fn(params, cfg, tokens, targets):
    logits = llama_forward(params, cfg, tokens)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return nll.mean()


def train_step(params, cfg: LlamaConfig, tokens, targets, lr: float = 1e-4):
    """One SGD step on the float leaves (packed integer buffers get zero
    gradients via the straight-through VJP and stay fixed)."""
    # allow_int: packed integer buffers participate as frozen leaves and get
    # float0 cotangents from the straight-through VJP
    loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params, cfg, tokens, targets)

    def upd(p, g):
        if g is None or not hasattr(p, "dtype"):
            return p
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) and g.dtype != jax.dtypes.float0:
            return (p.astype(jnp.float32) - lr * g.astype(jnp.float32)).astype(p.dtype)
        return p

    new_params = jax.tree_util.tree_map(upd, params, grads)
    return loss, new_params
