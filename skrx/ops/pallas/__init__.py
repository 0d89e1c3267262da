from .segsum_mxu import (MXUGraph, mxu_graph_from_coo,
                         mxu_graph_from_sp_matrix, propagate_mxu,
                         transpose_mxu_graph)
from .topk_blocks import blockwise_topk

__all__ = ["blockwise_topk", "MXUGraph", "mxu_graph_from_coo",
           "mxu_graph_from_sp_matrix", "propagate_mxu",
           "transpose_mxu_graph"]
