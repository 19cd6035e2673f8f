# SPDX-License-Identifier: Apache-2.0
"""Kernel configuration + persisted autotune cache.

TPU equivalent of the reference's three config layers
(triton_kernels/config.py + @triton.autotune + configs/*.json):

  (a) global flags (`AUTOTUNE`, `KERNEL`) with the same setter API —
      but applied at call time (no module reloading);
  (b) per-call block-size selection: heuristic defaults, overridden by
  (c) a persisted JSON cache keyed by the same signature the reference uses:
      str((M_bucket, N, K, group_size, elements_per_sample, type_id))
      (reference core.py:74-83) mapping to Pallas block sizes.

The autotuner that fills (c) by benchmarking lives in autotune.py.
"""

import json
import logging
import os
import threading
from dataclasses import dataclass, asdict

logger = logging.getLogger(__name__)
_FILE_LOCK = threading.Lock()


class AUTOTUNE:
    """Autotune effort per kernel family: 'max' | 'fast' | 'default' | False."""
    GEMV = "fast"
    GEMV_REVSPLITK = "fast"
    GEMV_SPLITK = "fast"
    GEMM_SPLITK = "fast"
    GEMM = "fast"


class KERNEL:
    ENABLE_CACHING = True
    CACHE_SIZE = 512  # API parity with the reference KERNEL class
                      # (its rotating-output cache bound); the TPU
                      # config table keeps all entries, no eviction


def set_autotune(config, use_cuda_graph: bool = None):  # use_cuda_graph: API parity, no-op on TPU
    """Set autotune mode per family. Accepts a dict {family: mode}, a string
    mode for all families, or False to disable (heuristic defaults only)."""
    families = ["GEMV", "GEMV_REVSPLITK", "GEMV_SPLITK", "GEMM_SPLITK", "GEMM"]
    if isinstance(config, dict):
        for k, v in config.items():
            setattr(AUTOTUNE, k.upper(), v)
    elif isinstance(config, str):
        for f in families:
            setattr(AUTOTUNE, f, config)
    elif config is False or config is None:
        for f in families:
            setattr(AUTOTUNE, f, False)
    else:
        raise ValueError(f"Invalid autotune config: {config}")


def set_kernel_caching(enable: bool):
    KERNEL.ENABLE_CACHING = bool(enable)


@dataclass(frozen=True)
class KernelConfig:
    """Pallas launch configuration — the TPU analogue of a Triton
    (BLOCK_M, BLOCK_N, BLOCK_K, num_warps, num_stages) tuple.

    ``build_bf16``: prefill dequant-cache build in bf16 arithmetic (halves
    the VPU traffic of the f32 intermediate; codes and offsets stay exact,
    the group-scale multiply picks up one bf16 rounding).
    ``n_sub``: split the prefill cache build into lane sub-columns so
    Mosaic's scheduler can interleave the VPU build of column h+1 with the
    MXU dot of column h (the build is otherwise serial with the dots).
    ``route``: non-kernel dispatch decision stored as a table entry;
    ``"fallback"`` routes the shape through the two-pass dense path
    (Pallas dequantize + dense MXU matmul) when the autotuner measured it
    faster than any fused config (giant-M prefill regime)."""
    block_m: int
    block_n: int
    block_k: int
    build_bf16: bool = False
    n_sub: int = 1
    route: str = ""

    def to_dict(self):
        d = asdict(self)
        # keep shipped tables minimal: drop default-valued extras
        if not d["build_bf16"]:
            del d["build_bf16"]
        if d["n_sub"] == 1:
            del d["n_sub"]
        if not d["route"]:
            del d["route"]
        return d

    @classmethod
    def from_dict(cls, d):
        return cls(block_m=d["block_m"], block_n=d["block_n"],
                   block_k=d["block_k"],
                   build_bf16=bool(d.get("build_bf16", False)),
                   n_sub=int(d.get("n_sub", 1)),
                   route=str(d.get("route", "")))


# family name -> {str(signature): config dict}
GEMLITE_TPU_CONFIG_CACHE = {}

# dispatch hit-rate counters: how often a forward found a tuned entry vs
# fell back to the block heuristics (the shipped-table coverage metric)
CONFIG_LOOKUP_STATS = {"hits": 0, "misses": 0}


def config_lookup_stats(reset: bool = False):
    """Return {'hits', 'misses', 'hit_rate'} of tuned-config lookups since
    import (or the last reset). Note: lookups happen at TRACE time, so each
    distinct (shape, dtype) counts once per compilation, not per call."""
    s = dict(CONFIG_LOOKUP_STATS)
    tot = s["hits"] + s["misses"]
    s["hit_rate"] = (s["hits"] / tot) if tot else None
    if reset:
        CONFIG_LOOKUP_STATS["hits"] = CONFIG_LOOKUP_STATS["misses"] = 0
    return s


def config_signature(M_bucket, N, K, group_size, elements_per_sample, type_id):
    """Same key structure as the reference JSON cache (core.py:74-83, 594)."""
    return str((M_bucket, N, K, group_size, elements_per_sample, type_id))


def lookup_config(family: str, sig: str):
    if not KERNEL.ENABLE_CACHING or family.startswith("__"):
        return None
    fam = GEMLITE_TPU_CONFIG_CACHE.get(family)
    d = fam.get(sig) if fam is not None else None
    if d is None:
        CONFIG_LOOKUP_STATS["misses"] += 1
        return None
    CONFIG_LOOKUP_STATS["hits"] += 1
    return KernelConfig.from_dict(d)


def store_config(family: str, sig: str, cfg: KernelConfig):
    GEMLITE_TPU_CONFIG_CACHE.setdefault(family, {})[sig] = cfg.to_dict()


def cache_config(filename: str):
    """Merge the in-memory cache into a JSON file (reference core.py:559-598)."""
    with _FILE_LOCK:   # one critical section: a concurrent writer's read
        try:            # must not interleave with our merge+write
            with open(filename, "r") as f:
                config = json.load(f)
        except (OSError, json.JSONDecodeError):
            config = {}
        for name, entries in GEMLITE_TPU_CONFIG_CACHE.items():
            config.setdefault(name, {}).update(entries)
        with open(filename, "w") as f:
            json.dump(config, f)


def load_config(filename: str, print_error: bool = True, overwrite: bool = False) -> bool:
    """Load a JSON config cache (reference core.py:600-622)."""
    global GEMLITE_TPU_CONFIG_CACHE
    if filename is None:
        return False
    try:
        with _FILE_LOCK, open(filename, "r") as f:
            config = json.load(f)
        config = {k: v for k, v in config.items() if not k.startswith("__")}
        if overwrite:
            GEMLITE_TPU_CONFIG_CACHE = config
        else:
            for name, entries in config.items():
                GEMLITE_TPU_CONFIG_CACHE.setdefault(name, {}).update(entries)
    except Exception as e:
        if print_error:
            logger.error(f"Failed to load the cache file '{filename}': {e}")
        return False
    return True


def reset_config():
    global GEMLITE_TPU_CONFIG_CACHE
    GEMLITE_TPU_CONFIG_CACHE = {}


_DEFAULT_CONFIG_DONE = False


def ensure_default_config():
    """Load the shipped per-chip table on FIRST KERNEL DISPATCH (not import:
    ``jax.devices()`` force-initializes the backend, which would defeat lazy
    backend selection for processes that only want host-side utilities).
    Entries already present (e.g. a user ``load_config``) are never
    overwritten."""
    global _DEFAULT_CONFIG_DONE
    if _DEFAULT_CONFIG_DONE:
        return
    _DEFAULT_CONFIG_DONE = True
    try:
        path = _find_default_config_path()
        if path is None:
            return
        with _FILE_LOCK, open(path, "r") as f:
            config = json.load(f)
        for name, entries in config.items():
            if name.startswith("__"):   # table metadata, not a family
                continue
            fam = GEMLITE_TPU_CONFIG_CACHE.setdefault(name, {})
            for sig, cfg in entries.items():
                fam.setdefault(sig, cfg)
        logger.warning("Loaded %s config.", path)
    except Exception:  # pragma: no cover - never fail dispatch on a table
        pass


def _find_default_config_path():
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower().replace(" ", "_")
    except Exception:
        return None
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")
    if not os.path.isdir(root):
        return None
    tags = sorted((f.split(".")[0] for f in os.listdir(root) if f.endswith(".json")),
                  key=len, reverse=True)
    for tag in tags:
        if tag in kind:
            return os.path.join(root, tag + ".json")
    return None


def load_default_config():
    """Eagerly load the shipped per-TPU-generation config, matched by device
    kind substring (analogue of reference core.py:634-654)."""
    path = _find_default_config_path()
    if path is not None and load_config(path, print_error=False):
        logger.warning("Loaded %s config.", path)
        return path
    return None
