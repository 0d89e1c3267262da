"""Graph utilities shared by the GCN family.

Capability parity with reference skrec/utils/common.py:11-40, plus COO-edge
helpers used by the TPU segment-sum propagation path (the reference keeps
scipy sparse matrices and multiplies with torch.sparse.mm; on TPU we lower
graphs to static int32 edge lists + float32 weights — see skrx/ops/graph.py).
"""
from typing import Tuple

import numpy as np
import scipy.sparse as sp

__all__ = ["normalize_adj_matrix", "sp_mat_to_edges", "build_ui_adjacency"]


def normalize_adj_matrix(sp_mat: sp.spmatrix, norm_method: str = "symmetric") -> sp.csr_matrix:
    """Degree-normalize an adjacency matrix.

    ``left``: D^-1 A;  ``symmetric``: D^-1/2 A D^-1/2.
    Zero-degree rows get 0 (inf guarded), matching the reference behavior.
    """
    adj = sp.csr_matrix(sp_mat, dtype=np.float64)
    degree = np.asarray(adj.sum(axis=1)).flatten()
    if norm_method == "left":
        with np.errstate(divide="ignore"):
            d_inv = np.power(degree, -1.0)
        d_inv[np.isinf(d_inv)] = 0.0
        norm_adj = sp.diags(d_inv) @ adj
    elif norm_method == "symmetric":
        with np.errstate(divide="ignore"):
            d_inv_sqrt = np.power(degree, -0.5)
        d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
        d_mat = sp.diags(d_inv_sqrt)
        norm_adj = d_mat @ adj @ d_mat
    else:
        raise ValueError(f"'{norm_method}' is an invalid normalization method "
                         f"(expected 'left' or 'symmetric')")
    return norm_adj.tocsr()


def sp_mat_to_edges(sp_mat: sp.spmatrix) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lower a scipy sparse matrix to (row_idx, col_idx, values) int32/float32
    arrays — the static device-ready COO form consumed by
    :func:`skrx.ops.graph.propagate`."""
    coo = sp.coo_matrix(sp_mat)
    return (coo.row.astype(np.int32), coo.col.astype(np.int32),
            coo.data.astype(np.float32))


def build_ui_adjacency(user_ids: np.ndarray, item_ids: np.ndarray,
                       num_users: int, num_items: int,
                       norm_method: str = "symmetric",
                       self_loop: bool = False) -> sp.csr_matrix:
    """Build the (num_users+num_items)^2 bipartite interaction adjacency used
    by LightGCN-style propagation (items offset by num_users), normalized."""
    n = num_users + num_items
    rows = np.concatenate([user_ids, item_ids + num_users])
    cols = np.concatenate([item_ids + num_users, user_ids])
    data = np.ones(len(rows), dtype=np.float64)
    adj = sp.csr_matrix((data, (rows, cols)), shape=(n, n))
    if self_loop:
        adj = adj + sp.eye(n, format="csr")
    return normalize_adj_matrix(adj, norm_method)
