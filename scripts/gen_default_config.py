# SPDX-License-Identifier: Apache-2.0
"""Generate the shipped per-TPU-generation autotune config table by running
the real autotuner on this chip (the analogue of the reference's shipped
configs/<gpu>.json, core.py:634-654).

Usage: python scripts/gen_default_config.py [out.json]
"""
import os
import sys
import logging

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.WARNING, format="%(message)s")


def main():
    import jax
    import gemlite_tpu
    from gemlite_tpu.autotune import autotune_shapes
    from gemlite_tpu import config as cfg

    kind = jax.devices()[0].device_kind.lower().replace(" ", "_")
    tag = kind.replace("tpu_", "")
    default_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "gemlite_tpu", "configs", f"{tag}.json")
    out = sys.argv[1] if len(sys.argv) > 1 else default_out
    os.makedirs(os.path.dirname(out), exist_ok=True)

    # Llama-3-8B projection shapes + the benchmark shape; write incrementally
    shapes = [(4096, 4096), (14336, 4096), (4096, 14336), (1024, 4096)]
    for gs in (128, 64):
        for shape in shapes:
            print(f"=== autotuning W4 gs={gs} {shape} ===", flush=True)
            autotune_shapes([shape], W_nbits=4, group_size=gs,
                            batch_sizes=(1, 16, 64, 512), effort="fast",
                            verbose=True)
            cfg.cache_config(out)
            n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
            print(f"wrote {out} ({n} entries)", flush=True)


if __name__ == "__main__":
    main()
