from .losses import (inner_product, euclidean_distance, l2_distance, bpr_loss,
                     l2_loss, sigmoid_cross_entropy, square_loss, hinge_loss,
                     top1_loss, bpr_max_loss, top1_max_loss, info_nce_loss,
                     log_loss)
from .initializers import get_initializer, InitArg, torch_layer_default
from .metrics import (METRIC2ID, ID2METRIC, ranking_metrics_from_hits,
                      topk_from_scores, mask_items, eval_score_matrix_device,
                      hits_against_padded_truth)
from .sampling import (is_member_sorted, sample_negatives,
                       sample_negatives_weighted,
                       gumbel_topk_without_replacement)
from .graph import (Graph, graph_from_sp_matrix, propagate, propagate_layers,
                    edge_dropout)
from . import attention, mm_graph, optim, rnn

__all__ = [
    "inner_product", "euclidean_distance", "l2_distance", "bpr_loss",
    "l2_loss", "sigmoid_cross_entropy", "square_loss", "hinge_loss",
    "top1_loss", "bpr_max_loss", "top1_max_loss", "info_nce_loss", "log_loss",
    "get_initializer", "InitArg", "torch_layer_default",
    "METRIC2ID", "ID2METRIC", "ranking_metrics_from_hits", "topk_from_scores",
    "mask_items", "eval_score_matrix_device", "hits_against_padded_truth",
    "is_member_sorted", "sample_negatives", "sample_negatives_weighted",
    "gumbel_topk_without_replacement",
    "Graph", "graph_from_sp_matrix", "propagate", "propagate_layers",
    "edge_dropout",
    "attention", "mm_graph", "optim", "rnn",
]
