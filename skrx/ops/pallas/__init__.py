from .segsum_mxu import (MXUGraph, WeightedMXUGraph,
                         mxu_graph_from_coo,
                         mxu_graph_from_sp_matrix, propagate_mxu,
                         propagate_mxu_weighted, transpose_mxu_graph,
                         weighted_mxu_graph_from_coo)
from .dot_topk import dot_topk, dot_topk_candidates, dot_topk_ranks
from .topk_blocks import (blockwise_candidates, blockwise_topk,
                          kth_largest, masked_topk_ranks,
                          masked_topk_ranks_small, vmem_topk)

__all__ = ["blockwise_topk", "blockwise_candidates", "masked_topk_ranks",
           "masked_topk_ranks_small",
           "kth_largest", "vmem_topk", "dot_topk", "dot_topk_candidates",
           "dot_topk_ranks", "MXUGraph", "mxu_graph_from_coo",
           "mxu_graph_from_sp_matrix", "propagate_mxu",
           "transpose_mxu_graph", "WeightedMXUGraph",
           "weighted_mxu_graph_from_coo", "propagate_mxu_weighted"]
