from .sharding import make_mesh, shard_data, data_parallel_step, exact_sharded_step
