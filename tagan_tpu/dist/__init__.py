from .mesh import (make_mesh, batch_sharding, replicated, node_sharded,
                   shard_params, DATA_AXIS, GRAPH_AXIS)
from .spmd import (make_train_step, make_eval_step, batch_specs,
                   batch_shardings, shard_batch)
