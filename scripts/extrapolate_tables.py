# SPDX-License-Identifier: Apache-2.0
"""Ship chip-aware extrapolated per-chip tables from the measured v5e one.

The reference ships ~10 per-GPU tables (core.py:634-654); we have real
hardware for v5e (v5_lite) only, so v5p/v6e tables are DERIVED — not cloned —
from the v5e winners using the public chip ratios (scaling-book numbers):

    chip   HBM BW      bf16 MXU    VMEM     BW vs v5e   FLOP/byte vs v5e
    v5e     819 GB/s   197 TF/s   128 MiB      1.0          1.0
    v5p    2765 GB/s   459 TF/s   128 MiB      3.38         0.69
    v6e    1640 GB/s   918 TF/s   128 MiB      2.00         2.33

Method (documented per-table in ``__metadata__``):

1. **Decode entries (M_bucket <= 64, bandwidth-bound).** Per grid step the
   kernel streams a (block_k x block_n) packed block; fixed per-step cost
   (grid sequencing + DMA issue, ~1-2 us measured on v5e) is amortized over
   bytes/BW. A chip with r x the bandwidth finishes the same block r x
   faster, so the overhead fraction grows r x — block AREA is scaled by r
   (power-of-2 rounded), preferring deeper block_k on v5p (DMA row runs)
   and wider block_n on v6e, clamped by the shared 128-MiB VMEM envelope
   (stacked-plane buffer 2*bk*bn bytes <= 12 MiB) and re-validated against
   the real kernel gates (can_use_decode_kernel / can_use_int8_decode) —
   invalid scalings keep the measured v5e blocks.
2. **Prefill GEMM entries (M >= 128, MXU-bound).** Block shapes are set by
   the VMEM dequant-cache geometry, which is identical across the three
   chips (same VMEM, same Mosaic tiling) — carried over unchanged.
3. **Giant-M routing (route="fallback")**: the two-pass dense route spends
   extra HBM bytes to buy full-rate MXU compute. v5p has 1.45x the
   bandwidth per FLOP of v5e -> the extra pass is relatively cheaper ->
   fallback extended to every M >= 2048 entry. v6e has 2.3x the compute
   per byte -> the fused kernel's MXU inefficiency matters less ->
   fallback kept only where v5e measured it at M >= 4096.
4. **M == 1 family mirroring**: GEMV / GEMV_REVSPLITK / GEMV_SPLITK all
   dispatch to the same decode kernel (core.py registry parity), so
   measured M==1 winners are mirrored across all three family tables
   (applied to v5_lite too, in-place).

These are priors, not measurements; regenerate with
``scripts/gen_table_full.py`` on real v5p/v6e hardware to replace them.
Usage: python scripts/extrapolate_tables.py [--force]
"""
import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

CHIPS = {
    # tag -> (bw_ratio vs v5e, bk-first?, fallback_from_M | None)
    "v5p": dict(bw_ratio=3.38, prefer="bk", fallback_from=2048),
    "v6_lite": dict(bw_ratio=2.00, prefer="bn", fallback_from=None),
}
VMEM_PLANE_CAP = 12 * 1024 * 1024  # stacked-plane buffer bound (2*bk*bn B)
GEMV_FAMILIES = ("GEMV", "GEMV_REVSPLITK", "GEMV_SPLITK")


def _meta_for(sig_tuple, cfg_d):
    """Reconstruct enough LayerMeta from a signature to drive the real
    kernel gates."""
    from gemlite_tpu.core import LayerMeta
    from gemlite_tpu.dtypes import DType, is_mx_dtype

    M, N, K, gs, elems, type_id = sig_tuple
    dt = DType(type_id // 100)
    nb = type_id % 100
    mx = is_mx_dtype(dt)
    int8 = dt == DType.INT8
    return LayerMeta(
        scaled_activations=0, W_nbits=nb, group_size=gs,
        unpack_mask=2**nb - 1, elements_per_sample=elems,
        input_dtype=dt.value, output_dtype=DType.BF16.value,
        acc_dtype=DType.INT32.value if int8 else DType.FP32.value,
        meta_dtype=DType.FP32.value,
        channel_scale_mode=0, W_group_mode=2 if mx else 4,
        data_contiguous=1, in_features=K, out_features=N,
        zero_is_scalar=0, packing_bitwidth=32,
        w_layout=0 if (int8 or mx) else 1,
    )


def _scale_decode(sig_tuple, cfg_d, chip):
    """Scale a measured decode block for a higher-bandwidth chip; keep the
    original when no valid larger block exists."""
    from gemlite_tpu.config import KernelConfig
    from gemlite_tpu.dtypes import DType
    from gemlite_tpu.ops.pallas_decode import can_use_decode_kernel
    from gemlite_tpu.ops.pallas_int8 import can_use_int8_decode

    M, N, K, gs, elems, type_id = sig_tuple
    if cfg_d.get("route"):
        return cfg_d
    meta = _meta_for(sig_tuple, cfg_d)
    gate = (can_use_int8_decode if DType(type_id // 100) == DType.INT8
            else can_use_decode_kernel)
    bm, bn, bk = cfg_d["block_m"], cfg_d["block_n"], cfg_d["block_k"]
    area_target = bn * bk * (4 if chip["bw_ratio"] > 3 else 2)
    # candidate growth steps in preference order
    if chip["prefer"] == "bk":
        steps = [(bn, bk * 4), (bn, bk * 2), (bn * 2, bk * 2),
                 (bn * 2, bk), (bn * 4, bk)]
    else:
        steps = [(bn * 4, bk), (bn * 2, bk), (bn * 2, bk * 2),
                 (bn, bk * 2), (bn, bk * 4)]
    best = None
    for nbn, nbk in steps:
        if nbn * nbk > area_target or nbn * nbk <= bn * bk:
            continue
        if N % nbn or K % nbk:
            continue
        if 2 * nbn * nbk > VMEM_PLANE_CAP:
            continue
        cand = KernelConfig(block_m=bm, block_n=nbn, block_k=nbk,
                            build_bf16=bool(cfg_d.get("build_bf16", False)),
                            n_sub=int(cfg_d.get("n_sub", 1)))
        if gate(meta, min(M, bm), N, K, cand):
            best = cand
            break
    return best.to_dict() if best is not None else dict(cfg_d)


def derive_table(src_table, chip):
    out = {}
    for fam, entries in src_table.items():
        if fam.startswith("__"):
            continue
        new = {}
        for sig, cfg_d in entries.items():
            t = ast.literal_eval(sig)
            M = t[0]
            if M <= 64 and not cfg_d.get("route"):
                new[sig] = _scale_decode(t, cfg_d, chip)
            elif (chip["fallback_from"] and fam == "GEMM"
                  and M >= chip["fallback_from"]):
                new[sig] = {"block_m": 0, "block_n": 0, "block_k": 0,
                            "route": "fallback"}
            else:
                new[sig] = dict(cfg_d)
        out[fam] = new
    return out


def mirror_gemv(table):
    """Mirror every M==1 entry across the three GEMV-family tables (same
    decode kernel under all three names)."""
    merged = {}
    for fam in GEMV_FAMILIES:
        for sig, cfg_d in table.get(fam, {}).items():
            if ast.literal_eval(sig)[0] == 1:
                merged.setdefault(sig, cfg_d)
    # GEMM_SPLITK M==1 entries (e.g. MX dtypes route there) also serve GEMV
    for sig, cfg_d in table.get("GEMM_SPLITK", {}).items():
        if ast.literal_eval(sig)[0] == 1:
            merged.setdefault(sig, cfg_d)
    for fam in GEMV_FAMILIES:
        table.setdefault(fam, {})
        for sig, cfg_d in merged.items():
            table[fam].setdefault(sig, dict(cfg_d))
    return table


def main():
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "gemlite_tpu", "configs")
    src = os.path.join(root, "v5_lite.json")
    if not os.path.exists(src):
        sys.exit("no v5_lite.json to extrapolate from")
    with open(src) as f:
        v5e = json.load(f)
    v5e.pop("__metadata__", None)
    v5e = mirror_gemv(v5e)
    with open(src, "w") as f:
        json.dump(v5e, f)
    print(f"v5_lite.json: mirrored GEMV families, "
          f"{ {k: len(v) for k, v in v5e.items()} }")

    force = "--force" in sys.argv
    for tag, chip in CHIPS.items():
        out = os.path.join(root, f"{tag}.json")
        if os.path.exists(out) and not force:
            with open(out) as f:
                existing = json.load(f)
            if existing.get("__metadata__", {}).get("derived") == "chip-aware-v2":
                print(f"skip {out}: already chip-aware (use --force)")
                continue
        table = derive_table(v5e, chip)
        table["__metadata__"] = {
            "derived": "chip-aware-v2",
            "source": "v5_lite.json (measured on TPU v5e)",
            "method": (
                f"decode blocks area-scaled ~{chip['bw_ratio']:.2f}x "
                f"(HBM-BW ratio vs v5e, {chip['prefer']}-first, VMEM-capped, "
                "gate-validated); prefill blocks carried (same VMEM "
                "geometry); giant-M fallback routing shifted by FLOP/byte "
                "ratio. See scripts/extrapolate_tables.py. PRIOR, not "
                "measurement - regenerate with gen_table_full.py on real "
                "hardware."),
        }
        with open(out, "w") as f:
            json.dump(table, f)
        n = sum(len(v) for k, v in table.items() if not k.startswith("__"))
        diff = sum(1 for fam in table if not fam.startswith("__")
                   for s in table[fam]
                   if table[fam][s] != v5e.get(fam, {}).get(s))
        print(f"wrote {out}: {n} entries, {diff} differ from v5e")


if __name__ == "__main__":
    main()
