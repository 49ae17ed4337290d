from .mesh import (
    create_mesh,
    data_sharding,
    global_batch_from_local,
    init_distributed,
    replicate,
    shard_batch,
)
