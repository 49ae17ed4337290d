from .mesh import create_mesh, data_sharding, replicate, shard_batch
