# SPDX-License-Identifier: Apache-2.0
"""Batch-size (M) bucketing.

On TPU every distinct shape is a distinct XLA compilation, so the flattened
token count M is padded up to a bucket before entering the kernels; this bounds
the number of compilations exactly the way the reference bounds its autotune
sweeps (reference triton_kernels/utils.py:136-174). Buckets are powers of two
plus midpoints (and an optional serving-engine batch list), 'next' mode.
"""

import math
from bisect import bisect_left

M_MAXVAL = 4096

_SERVING_BATCHES = (
    list(range(1, 17)) + list(range(24, 257, 8)) + [384, 512]
)


def _bucket_values(max_m: int, min_split: int = 32, divisors=(2, 4),
                   include_serving: bool = False):
    vals = set()
    p = 1
    while p <= max_m:
        vals.add(p)
        if p >= min_split and p * 2 <= max_m:
            for d in divisors:
                vals.add((p + p * 2) // d)
        p *= 2
    if include_serving:
        vals.update(v for v in _SERVING_BATCHES if v <= max_m)
    return sorted(vals)


_BUCKETS = _bucket_values(M_MAXVAL)


def _next_bucket(m: int) -> int:
    if m <= 0:
        return 0
    if m >= M_MAXVAL:
        # beyond the table, round up to the next multiple of 1024 to keep
        # compilation count bounded while not over-padding huge prefills
        return int(math.ceil(m / 1024) * 1024)
    i = bisect_left(_BUCKETS, m)
    return _BUCKETS[i]


# Module-level hook so users can swap the bucketing policy, mirroring
# gemlite.set_autotune_setting (reference core.py:85-87).
get_closest_m = _next_bucket


def set_autotune_setting(fct):
    """Replace the M-bucketing function (e.g. ``lambda M: M`` for exact shapes)."""
    global get_closest_m
    get_closest_m = fct
