# SPDX-License-Identifier: Apache-2.0
"""Ship extrapolated per-chip tables from the measured v5e (v5_lite) one.

v5p and v6e have the same Mosaic block-shape constraints and >= v5e VMEM,
and the measured-good block orders (narrow-n deep-k prefill, (2048,1024)-ish
decode) are set by VMEM/MXU geometry that carries over — so until real
chips are available, the v5e winners are a far better prior than bare
heuristics (the reference ships ~10 per-GPU tables the same way,
core.py:634-654). Tags match jax device_kind substrings:
  v5_lite (v5e, measured) -> v5p.json, v6_lite.json (extrapolated).
"""
import json
import os
import sys

root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "gemlite_tpu", "configs")
src = os.path.join(root, "v5_lite.json")
if not os.path.exists(src):
    sys.exit("no v5_lite.json to extrapolate from")
with open(src) as f:
    table = json.load(f)
n = sum(len(v) for v in table.values())
force = "--force" in sys.argv
for tag in ("v5p", "v6_lite"):
    out = os.path.join(root, f"{tag}.json")
    if os.path.exists(out) and not force:
        # never silently clobber a (possibly measured) existing table
        with open(out) as f:
            existing = json.load(f)
        n_old = sum(len(v) for v in existing.values())
        print(f"skip {out}: exists with {n_old} entries (use --force to "
              f"overwrite with the v5e extrapolation)")
        continue
    with open(out, "w") as f:
        json.dump(table, f)
    print(f"wrote {out} ({n} entries, extrapolated from v5e)")
