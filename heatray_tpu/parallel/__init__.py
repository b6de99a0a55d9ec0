"""Multi-device sharding (dp over pixels, sp over samples)."""

from .sharding import (
    make_mesh,
    make_sharded_train_step,
    render_sharded,
    replicate,
    shard_context,
    sharded_accum,
)

__all__ = [
    "make_mesh",
    "make_sharded_train_step",
    "render_sharded",
    "replicate",
    "shard_context",
    "sharded_accum",
]
