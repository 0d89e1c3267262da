from .mesh import (make_mesh, data_sharding, model_row_sharding, replicated,
                   shard_params_for_mf, mf_param_shardings,
                   model_parallel_size, DATA_AXIS, MODEL_AXIS, P, Mesh,
                   NamedSharding)
from .topk_merge import (sharded_topk_scores, local_then_global_topk,
                         sharded_dot_topk)
from .graph_shard import (ShardedGraph, sharded_graph_from_sp_matrix,
                          sharded_graph_from_coo, make_sharded_propagate,
                          ShardedPropGraph, pad_rows, unpad_rows)
from .distributed import (initialize_distributed, is_multi_host,
                          process_index, global_batch_from_local)

__all__ = [
    "ShardedGraph", "sharded_graph_from_sp_matrix", "sharded_graph_from_coo",
    "make_sharded_propagate", "ShardedPropGraph", "pad_rows", "unpad_rows",
    "make_mesh", "data_sharding", "model_row_sharding", "replicated",
    "shard_params_for_mf", "mf_param_shardings", "model_parallel_size",
    "DATA_AXIS", "MODEL_AXIS", "P", "Mesh", "NamedSharding",
    "sharded_topk_scores", "local_then_global_topk", "sharded_dot_topk",
    "initialize_distributed", "is_multi_host", "process_index",
    "global_batch_from_local",
]
