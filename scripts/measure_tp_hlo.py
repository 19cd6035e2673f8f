# SPDX-License-Identifier: Apache-2.0
"""Measure the PRODUCTION tensor-parallel path's collectives from compiled HLO.

SCALING.md's round-3 claim that the shard_map Column/RowParallel forward has
no scale/zero all-gathers was asserted from design; this script compiles
parallel/sharding.py's actual forwards on an 8-virtual-device CPU mesh and
counts every collective op (kind, shape, bytes) in the optimized HLO modules,
then checks them against the analytic comm model:

  column-parallel (gather_output=False): 0 collectives
  column-parallel (gather_output=True):  1 all-gather of (M, N) outputs
  row-parallel (psum):                   1 all-reduce of (M, N) outputs
  row-parallel (scatter):                1 reduce-scatter of (M, N) outputs
  NEVER: any collective touching W_q / scales / zeros (weights stay put)

Usage: python scripts/measure_tp_hlo.py [--tp 2|4|8] [--update-md]
"""
import argparse
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1, "pred": 1, "f64": 8}

_COLL_RE = re.compile(
    r"(\w[\w.-]*) = (\w+)\[([\d,]*)\][^=]*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\(")


def collectives_of(compiled_text):
    """[(kind, dtype, shape, bytes)] for every collective in optimized HLO."""
    out = []
    for m in _COLL_RE.finditer(compiled_text):
        _, dt, shape_s, kind = m.groups()
        shape = [int(s) for s in shape_s.split(",") if s] or [1]
        n = 1
        for s in shape:
            n *= s
        out.append((kind, dt, tuple(shape), n * _DT_BYTES.get(dt, 4)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=0,
                    help="single tp degree; default sweeps 2, 4, 8")
    ap.add_argument("--M", type=int, default=16)
    ap.add_argument("--update-md", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    import jax.numpy as jnp
    import gemlite_tpu  # noqa: F401
    from gemlite_tpu import DType, GemLiteLinear
    from gemlite_tpu.parallel.sharding import (ColumnParallelLinear,
                                               RowParallelLinear, make_mesh)

    M = args.M
    N = K = 4096
    rng = np.random.default_rng(0)
    W_q = rng.integers(0, 16, size=(N, K)).astype(np.uint8)
    G = N * K // 128
    scales = (2.0 ** rng.integers(-10, -6, (G, 1))).astype(np.float32)
    zeros = rng.integers(0, 16, (G, 1)).astype(np.float32)
    layer = GemLiteLinear(4, 128, K, N, DType.BF16, DType.BF16).pack(
        W_q, scales, zeros)

    x = jnp.zeros((M, K), jnp.bfloat16)

    rows, bad = [], []
    for tp in ([args.tp] if args.tp else [2, 4, 8]):
        mesh = make_mesh({"tp": tp}, devices=np.asarray(jax.devices())[:tp])
        cases = [
            ("column gather_output=False",
             ColumnParallelLinear(layer, mesh, gather_output=False), 0, None),
            ("column gather_output=True",
             ColumnParallelLinear(layer, mesh, gather_output=True), 1,
             "all-gather"),
            ("row psum",
             RowParallelLinear(layer, mesh, reduce_output="psum"), 1,
             "all-reduce"),
            ("row reduce_scatter",
             RowParallelLinear(layer, mesh, reduce_output="scatter"), 1,
             "reduce-scatter"),
        ]
        for label, tpl, want_n, want_kind in cases:
            if label.startswith("row"):
                # x arrives K-sharded from the previous column layer
                from jax.sharding import NamedSharding, PartitionSpec as P
                xin = jax.device_put(x, NamedSharding(mesh, P(None, "tp")))
            else:
                xin = x
            fn = jax.jit(lambda xx, t=tpl: t(xx))
            txt = fn.lower(xin).compile().as_text()
            colls = collectives_of(txt)
            # weight/meta arrays must never move: any collective bigger than
            # the output tensor is a red flag (output M x N x 4B f32 staging)
            out_bytes = M * N * 4
            oversized = [c for c in colls if c[3] > out_bytes]
            kinds = [c[0] for c in colls]
            ok = (len(colls) == want_n
                  and (want_kind is None or kinds == [want_kind])
                  and not oversized)
            total = sum(c[3] for c in colls)
            rows.append((label, tp, kinds or ["-"], total,
                         "PASS" if ok else "FAIL"))
            print(f"{'PASS' if ok else 'FAIL'} tp={tp} {label:28s} "
                  f"collectives={kinds or '-'} bytes={total}", flush=True)
            for c in colls:
                print(f"       {c[0]:18s} {c[1]}{list(c[2])} = {c[3]} B",
                      flush=True)
            if not ok:
                bad.append((tp, label))

    if args.update_md:
        md_rows = "\n".join(
            f"| {r[0]} | {r[1]} | {'+'.join(r[2])} | {r[3]} | {r[4]} |"
            for r in rows)
        block = (
            "\n## Measured: production shard_map TP path (compiled-HLO "
            "collective audit)\n\n"
            "`scripts/measure_tp_hlo.py` compiles the ACTUAL\n"
            "parallel/sharding.py forwards (not the jnp oracle) on an\n"
            "8-virtual-device mesh and counts every collective in the\n"
            "optimized HLO:\n\n"
            "| forward | tp | collectives | comm bytes | verdict |\n"
            "|---|---|---|---|---|\n"
            + md_rows + "\n\n"
            "No collective ever touches W_q/scales/zeros (none larger than\n"
            "the output tensor appears), confirming the design claim that\n"
            "weight and quant-metadata shards never move — the only traffic\n"
            "is the output epilogue the analytic model (above) charges.\n")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(root, "SCALING.md")
        with open(path) as f:
            txt = f.read()
        marker = "\n## Measured: production shard_map TP path"
        if marker in txt:
            txt = txt[:txt.index(marker)]
        with open(path, "w") as f:
            f.write(txt.rstrip() + "\n" + block)
        print("updated SCALING.md", flush=True)

    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
