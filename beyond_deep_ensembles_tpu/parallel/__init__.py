"""Device-mesh parallelism: data / member(particle) sharding helpers."""
from .mesh import (  # noqa: F401
    DATA_AXIS,
    MEMBER_AXIS,
    make_mesh,
    shard_batch,
    shard_member_state,
    replicate,
)
from .multistep import make_epoch_runner, make_multi_step, stack_batches  # noqa: F401
from .pipelines import ParallelTrainer  # noqa: F401
