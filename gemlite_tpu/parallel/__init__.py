# SPDX-License-Identifier: Apache-2.0
from .sharding import (
    make_mesh,
    shard_layer,
    ColumnParallelLinear,
    RowParallelLinear,
    check_shard_alignment,
)
from .pipeline import split_stages, stack_stages, pipeline_apply
