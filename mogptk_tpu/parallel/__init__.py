from .sharding import (make_mesh, shard_data, data_parallel_step,
                       exact_sharded_step, iterative_ring_step)
from .ring import mosm_ring_matvec, mosm_ring_lowrank_vjp
