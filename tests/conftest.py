# Tests run on CPU with 8 virtual devices so kernel (interpret-mode) and
# multi-chip sharding tests work without TPU hardware. Must run before jax import.
#
# NOTE: in this environment every fresh XLA compilation blocks for seconds
# (compilation is proxied), so we enable the persistent compilation cache —
# first run is slow, subsequent runs are fast.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU tunnel platform and sets
# jax_platforms="axon,cpu" — the env var alone is not enough to force CPU.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
