from .mesh import (
    create_mesh,
    data_sharding,
    global_batch_from_local,
    init_distributed,
    make_param_constraint,
    replicate,
    shard_batch,
    shard_train_state,
    zero1_extend_spec,
)
