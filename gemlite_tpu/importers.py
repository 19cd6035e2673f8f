# SPDX-License-Identifier: Apache-2.0
"""Checkpoint importers: HuggingFace Llama checkpoints -> gemlite_tpu models.

The reference's end-to-end story converts existing torch models in place
(reference helper.py:34-85 ``patch_model`` over ``nn.Linear``s, README.md:14,
219 Llama-3 claims); our model family is a functional pytree, so the importer
maps a stored checkpoint straight into the ``models/llama.py`` params dict:

    params, cfg = load_hf_llama("/path/to/llama-ckpt")       # dense bf16
    qparams = quantize_llama(params, W_nbits=4, group_size=128)

Supports:
  * HF directories with ``*.safetensors`` (single file or sharded via
    ``model.safetensors.index.json``) + ``config.json``,
  * ``pytorch_model.bin`` torch state dicts (needs torch),
  * in-memory ``transformers`` model objects / raw state dicts.

The safetensors reader is pure numpy + ml_dtypes (no torch dependency):
the format is [u64 header_len][JSON header][raw little-endian buffer].
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .models.llama import LlamaConfig

__all__ = [
    "read_safetensors",
    "write_safetensors",
    "load_hf_config",
    "load_hf_state_dict",
    "import_state_dict",
    "load_hf_llama",
    "export_hf_llama",
]

# safetensors dtype tag -> numpy dtype (ml_dtypes for the non-native ones)
def _st_dtype(tag: str):
    import ml_dtypes
    table = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "BF16": ml_dtypes.bfloat16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U64": np.uint64, "U32": np.uint32, "U16": np.uint16, "U8": np.uint8,
        "BOOL": np.bool_,
        "F8_E4M3": ml_dtypes.float8_e4m3fn, "F8_E5M2": ml_dtypes.float8_e5m2,
    }
    if tag not in table:
        raise ValueError(f"Unsupported safetensors dtype {tag!r}")
    return np.dtype(table[tag])


def read_safetensors(path: str, names: Optional[list] = None) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into {name: np.ndarray} (zero-copy views onto
    one mmap'd buffer; arrays are read-only)."""
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
    data = np.memmap(path, dtype=np.uint8, mode="r", offset=8 + header_len)
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        if names is not None and name not in names:
            continue
        dt = _st_dtype(info["dtype"])
        s, e = info["data_offsets"]
        out[name] = data[s:e].view(dt).reshape(info["shape"])
    return out


_NP_TO_ST = {
    "float64": "F64", "float32": "F32", "float16": "F16",
    "bfloat16": "BF16",
    "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
    "uint64": "U64", "uint32": "U32", "uint16": "U16", "uint8": "U8",
    "bool": "BOOL",
    "float8_e4m3fn": "F8_E4M3", "float8_e5m2": "F8_E5M2",
}


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Optional[Dict[str, str]] = None):
    """Write {name: np.ndarray} as a .safetensors file (format:
    [u64 header_len][JSON header][raw little-endian buffer])."""
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    bufs = []
    for name, a in tensors.items():
        a = np.ascontiguousarray(a)
        tag = _NP_TO_ST.get(a.dtype.name)
        if tag is None:
            raise ValueError(f"Unsupported dtype {a.dtype} for {name!r}")
        raw = a.tobytes()
        header[name] = {"dtype": tag, "shape": list(a.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        offset += len(raw)
        bufs.append(raw)
    hjson = json.dumps(header).encode()
    pad = (-len(hjson)) % 8          # 8-byte-align the buffer like HF does
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for raw in bufs:
            f.write(raw)


def export_hf_llama(params: Dict, cfg: LlamaConfig, path: str,
                    dtype=None, tie_word_embeddings: bool = False):
    """Export a dense models/llama.py params pytree as an HF Llama checkpoint
    (config.json + model.safetensors) loadable by ``transformers``. The
    inverse of load_hf_llama; quantized layers are not exportable here — use
    ``GemLiteLinear.save`` / checkpoint.py for packed state."""
    import ml_dtypes
    os.makedirs(path, exist_ok=True)
    dt = np.dtype(dtype if dtype is not None else ml_dtypes.bfloat16)

    def a(v):
        return np.asarray(v).astype(dt)

    sd = {"model.embed_tokens.weight": a(params["embed"]),
          "model.norm.weight": a(params["ln_f"])}
    if not tie_word_embeddings:
        sd["lm_head.weight"] = a(params["lm_head"])
    for i, blk in enumerate(params["blocks"]):
        L = f"model.layers.{i}."
        sd[L + "self_attn.q_proj.weight"] = a(blk["attn"]["wq"])
        sd[L + "self_attn.k_proj.weight"] = a(blk["attn"]["wk"])
        sd[L + "self_attn.v_proj.weight"] = a(blk["attn"]["wv"])
        sd[L + "self_attn.o_proj.weight"] = a(blk["attn"]["wo"])
        sd[L + "mlp.gate_proj.weight"] = a(blk["mlp"]["gate"])
        sd[L + "mlp.up_proj.weight"] = a(blk["mlp"]["up"])
        sd[L + "mlp.down_proj.weight"] = a(blk["mlp"]["down"])
        sd[L + "input_layernorm.weight"] = a(blk["ln_attn"])
        sd[L + "post_attention_layernorm.weight"] = a(blk["ln_mlp"])
    write_safetensors(os.path.join(path, "model.safetensors"), sd,
                      metadata={"format": "pt"})
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.norm_eps,
        "max_position_embeddings": cfg.max_seq_len,
        "hidden_act": "silu",
        "tie_word_embeddings": tie_word_embeddings,
        "torch_dtype": {"bfloat16": "bfloat16", "float32": "float32",
                        "float16": "float16"}.get(dt.name, "bfloat16"),
        "bos_token_id": 1, "eos_token_id": 2,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def load_hf_config(path: str, max_seq_len: Optional[int] = None,
                   dtype=None) -> LlamaConfig:
    """Map an HF ``config.json`` (LlamaConfig family) onto our LlamaConfig."""
    import jax.numpy as jnp
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "llama")
    if mt not in ("llama", "mistral", "qwen2"):
        raise ValueError(f"Unsupported model_type {mt!r} (llama-family only)")
    heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim") or hf["hidden_size"] // heads
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=hf.get("num_key_value_heads", heads),
        head_dim=head_dim,
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        max_seq_len=(max_seq_len if max_seq_len is not None
                     else min(int(hf.get("max_position_embeddings", 2048)), 2048)),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all weights of an HF checkpoint directory as numpy arrays.

    Resolution order: sharded safetensors index -> single model.safetensors ->
    any *.safetensors -> pytorch_model.bin (torch)."""
    idx = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        by_file: Dict[str, list] = {}
        for name, fname in weight_map.items():
            by_file.setdefault(fname, []).append(name)
        sd = {}
        for fname, names in by_file.items():
            sd.update(read_safetensors(os.path.join(path, fname), names))
        return sd
    single = os.path.join(path, "model.safetensors")
    if os.path.exists(single):
        return read_safetensors(single)
    anyst = [f for f in sorted(os.listdir(path)) if f.endswith(".safetensors")]
    if anyst:
        sd = {}
        for f in anyst:
            sd.update(read_safetensors(os.path.join(path, f)))
        return sd
    binp = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(binp):
        import torch
        sd = torch.load(binp, map_location="cpu", weights_only=True)
        return {k: _torch_to_np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"No safetensors / pytorch_model.bin under {path}")


def _torch_to_np(t) -> np.ndarray:
    import ml_dtypes
    import torch
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def import_state_dict(sd: Dict[str, Any], cfg: LlamaConfig) -> Dict:
    """Map HF Llama weight names onto the models/llama.py params pytree.

    HF layout: model.embed_tokens / model.layers.{i}.self_attn.{q,k,v,o}_proj /
    model.layers.{i}.mlp.{gate,up,down}_proj / input_layernorm /
    post_attention_layernorm / model.norm / lm_head (optionally tied)."""
    import jax.numpy as jnp

    def get(name):
        v = sd[name]
        if not isinstance(v, np.ndarray):
            v = _torch_to_np(v.detach() if hasattr(v, "detach") else v)
        return v

    def arr(name, dtype=None):
        return jnp.asarray(np.asarray(get(name)), dtype or cfg.dtype)

    prefix = "model." if "model.embed_tokens.weight" in sd else ""
    blocks = []
    for i in range(cfg.num_layers):
        L = f"{prefix}layers.{i}."
        blocks.append({
            "attn": {
                "wq": arr(L + "self_attn.q_proj.weight"),
                "wk": arr(L + "self_attn.k_proj.weight"),
                "wv": arr(L + "self_attn.v_proj.weight"),
                "wo": arr(L + "self_attn.o_proj.weight"),
            },
            "mlp": {
                "gate": arr(L + "mlp.gate_proj.weight"),
                "up": arr(L + "mlp.up_proj.weight"),
                "down": arr(L + "mlp.down_proj.weight"),
            },
            "ln_attn": arr(L + "input_layernorm.weight"),
            "ln_mlp": arr(L + "post_attention_layernorm.weight"),
        })
    embed = arr(prefix + "embed_tokens.weight")
    if "lm_head.weight" in sd:
        lm_head = arr("lm_head.weight")
    else:
        lm_head = embed  # tie_word_embeddings
    return {
        "embed": embed,
        "blocks": blocks,
        "ln_f": arr(prefix + "norm.weight"),
        "lm_head": lm_head,
    }


def load_hf_llama(path: str, max_seq_len: Optional[int] = None,
                  dtype=None) -> Tuple[Dict, LlamaConfig]:
    """One-call import: HF checkpoint directory -> (dense params, cfg).

    Follow with ``quantize_llama(params, W_nbits=..., group_size=...)`` or a
    helper processor for the quantized model (reference flow: helper.py
    ``patch_model`` + processors)."""
    cfg = load_hf_config(path, max_seq_len=max_seq_len, dtype=dtype)
    sd = load_hf_state_dict(path)
    params = import_state_dict(sd, cfg)
    return params, cfg


def from_transformers(model, max_seq_len: Optional[int] = None,
                      dtype=None) -> Tuple[Dict, LlamaConfig]:
    """Import an in-memory ``transformers`` LlamaForCausalLM."""
    import jax.numpy as jnp
    hf = model.config
    cfg = LlamaConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=getattr(hf, "num_key_value_heads", hf.num_attention_heads),
        head_dim=getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads,
        rope_theta=float(getattr(hf, "rope_theta", 10000.0)),
        norm_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
        max_seq_len=(max_seq_len if max_seq_len is not None
                     else min(int(getattr(hf, "max_position_embeddings", 2048)), 2048)),
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
    sd = {k: v for k, v in model.state_dict().items()}
    return import_state_dict(sd, cfg), cfg
