from .mesh import (make_mesh, batch_sharding, replicated, node_sharded,
                   shard_params, DATA_AXIS, GRAPH_AXIS)
from .spmd import (make_train_step, make_eval_step, batch_specs,
                   batch_shardings, shard_batch)
from .edge_partition import (partition_edges_by_query,
                             edge_partitioned_attention, scaling_report)
from .edge_partition import (partition_edges_by_query_and_key,
                             ring_edge_attention, make_ring_attention,
                             metric_placeholders)
