"""Device-mesh parallelism: data / member(particle) sharding helpers."""
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MEMBER_AXIS,
    make_mesh,
    shard_batch,
    shard_member_state,
    replicate,
)
