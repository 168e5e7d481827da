from . import distributed, mesh, shuffle
from .distributed import distributed_group_by, distributed_hash_join
from .mesh import (
    make_mesh,
    normalize_batch,
    shard_map_batches,
    stack_batches,
    unstack_batches,
)
from .shuffle import exchange, partition_ids
