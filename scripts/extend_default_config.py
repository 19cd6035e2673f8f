# SPDX-License-Identifier: Apache-2.0
"""Extend the shipped autotune table incrementally: more M buckets for the
Llama-8B shapes plus W8/W2 type ids. Safe to interrupt — the JSON is
rewritten (merged with the auto-loaded table) after every (shape, batch).

Usage: python scripts/extend_default_config.py [out.json]
"""
import os
import sys
import logging

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.basicConfig(level=logging.WARNING, format="%(message)s")


def main():
    import jax
    from gemlite_tpu.autotune import autotune_shapes
    from gemlite_tpu import config as cfg

    kind = jax.devices()[0].device_kind.lower().replace(" ", "_")
    tag = kind.replace("tpu_", "")
    default_out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "gemlite_tpu", "configs", f"{tag}.json")
    out = sys.argv[1] if len(sys.argv) > 1 else default_out

    def run(shapes, W_nbits, gs, batches):
        for shape in shapes:
            for bs in batches:
                print(f"=== W{W_nbits} gs={gs} {shape} M={bs} ===", flush=True)
                autotune_shapes([shape], W_nbits=W_nbits, group_size=gs,
                                batch_sizes=(bs,), effort="fast", verbose=True)
                cfg.cache_config(out)
                n = sum(len(v) for v in cfg.GEMLITE_TPU_CONFIG_CACHE.values())
                print(f"wrote {out} ({n} entries)", flush=True)

    llama = [(4096, 4096), (14336, 4096), (4096, 14336), (1024, 4096)]
    # finer M buckets around the serving regimes (1/16/64/512 already shipped)
    run(llama, 4, 128, (4, 128))
    run([(4096, 4096), (14336, 4096)], 4, 128, (8, 32, 256))
    # W8 + W2 coverage on the square shape
    run([(4096, 4096)], 8, 128, (1, 16, 512))
    run([(4096, 4096)], 2, 128, (1, 16, 512))


if __name__ == "__main__":
    main()
