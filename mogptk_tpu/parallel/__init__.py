from .sharding import (make_mesh, shard_data, data_parallel_step,
                       exact_sharded_step, iterative_ring_step,
                       use_mesh, active_mesh, sync_model_mesh)
from .ring import (ring_gram_matvec, ring_gram_lowrank_vjp,
                   mosm_ring_matvec, mosm_ring_lowrank_vjp)
from .chol import (distributed_cholesky, distributed_cho_solve,
                   distributed_lml, distributed_lml_stochastic)
