# SPDX-License-Identifier: Apache-2.0
"""Whole-model checkpointing for pytrees containing quantized layers.

The reference stops at layer-level state_dicts (core.py:502-517); serving a
model needs the whole parameter tree — including GemLiteLinear nodes with
their packed buffers and metadata vectors — saved and restored in one file.

Format: a single .npz holding every array leaf under a path key, plus a JSON
manifest describing the tree structure; GemLiteLinear nodes serialize as
their reference-compatible state_dict (packed W_q + 12-int metadata +
orig_shape). Works for any nesting of dict / list / tuple / arrays.
"""

import json
import io
from typing import Any

import numpy as np
import jax.numpy as jnp

from .core import GemLiteLinear
from .dtypes import _NPZ_BIT_VIEWS as _BIT_MARKERS
from .dtypes import npz_decode_array, npz_encode_array

__all__ = ["save_model", "load_model"]

_GEMLITE_TAG = "__gemlite_linear__"


def _esc(key: str) -> str:
    """Escape the path separator so dict keys containing '/' (HF-style flat
    param names) cannot collide with nested paths."""
    if not isinstance(key, str):
        raise TypeError(f"checkpoint dict keys must be str, got {type(key)!r}")
    return key.replace("%", "%25").replace("/", "%2F")


def _flatten(obj, path, arrays, manifest):
    if isinstance(obj, GemLiteLinear):
        sd = obj.state_dict()
        # per-key dtype markers: scales/zeros/bias are commonly bf16 and
        # W_q can be fp8 — np.savez degrades ml_dtypes to raw void records
        tag = {}
        for k in sorted(sd.keys()):
            arrays[f"{path}/{_esc(k)}"], tag[k] = npz_encode_array(sd[k])
        manifest[path] = {_GEMLITE_TAG: tag}
    elif isinstance(obj, dict):
        manifest[path] = {"dict": sorted(obj.keys())}
        for k in obj:
            _flatten(obj[k], f"{path}/{_esc(k)}", arrays, manifest)
    elif isinstance(obj, (list, tuple)):
        manifest[path] = {"list" if isinstance(obj, list) else "tuple": len(obj)}
        for i, v in enumerate(obj):
            _flatten(v, f"{path}/{i}", arrays, manifest)
    elif obj is None:
        manifest[path] = {"none": True}
    else:
        arrays[path], marker = npz_encode_array(obj)
        manifest[path] = {"array": marker or str(arrays[path].dtype)}


def _unflatten(path, arrays, manifest):
    node = manifest[path]
    if _GEMLITE_TAG in node:
        tag = node[_GEMLITE_TAG]
        if isinstance(tag, dict):
            sd = {k: npz_decode_array(arrays[f"{path}/{_esc(k)}"], m)
                  for k, m in tag.items()}
        else:  # legacy manifests: plain key list, native numpy dtypes
            sd = {k: arrays[f"{path}/{_esc(k)}"] for k in tag}
        layer = GemLiteLinear.__new__(GemLiteLinear)
        layer.bias = None
        layer.load_state_dict(sd)
        return layer
    if "dict" in node:
        return {k: _unflatten(f"{path}/{_esc(k)}", arrays, manifest)
                for k in node["dict"]}
    if "list" in node:
        return [_unflatten(f"{path}/{i}", arrays, manifest)
                for i in range(node["list"])]
    if "tuple" in node:
        return tuple(_unflatten(f"{path}/{i}", arrays, manifest)
                     for i in range(node["tuple"]))
    if "none" in node:
        return None
    return jnp.asarray(npz_decode_array(arrays[path], node["array"]
                                        if node["array"] in _BIT_MARKERS
                                        else None))


def save_model(params: Any, path: str):
    """Save a parameter pytree (dicts/lists/arrays/GemLiteLinear) to .npz."""
    arrays, manifest = {}, {}
    _flatten(params, "root", arrays, manifest)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_model(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        arrays = {k: data[k] for k in data.files}
    manifest = json.loads(bytes(arrays.pop("__manifest__")).decode())
    return _unflatten("root", arrays, manifest)
