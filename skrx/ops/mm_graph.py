"""Modality kNN item-item graph construction (multimodal family).

Shared TPU-side equivalent of the per-model kNN graph builders in the
reference (FREEDOM.py:126-147, LATTICE.py:66-100, MGCN.py:145-172): cosine
similarity -> top-k neighbors -> symmetric-normalized laplacian, cached on
disk under ``<data_dir>/_data_cache``. Built host-side once (the reference
also materializes the N^2 similarity), consumed as static COO edges by the
segment-sum propagation.
"""
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["cosine_knn", "knn_adj_edges", "normalized_laplacian_values",
           "cached_mm_edges"]


def cosine_knn(features: np.ndarray, k: int) -> np.ndarray:
    """(N, k) int32 indices of top-k cosine neighbors (self included,
    matching torch.topk over the full similarity row)."""
    norm = features / (np.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    sim = norm @ norm.T
    # argpartition then sort for exact torch.topk order
    part = np.argpartition(-sim, kth=min(k, sim.shape[1] - 1), axis=-1)[:, :k]
    rows = np.arange(sim.shape[0])[:, None]
    order = np.argsort(-sim[rows, part], axis=-1)
    return part[rows, order].astype(np.int32)


def normalized_laplacian_values(rows: np.ndarray, cols: np.ndarray,
                                n: int) -> np.ndarray:
    """D^-1/2 A D^-1/2 values for a 0/1 adjacency given as COO (row degree
    with 1e-7 eps, FREEDOM.py:141-147)."""
    deg = np.bincount(rows, minlength=n).astype(np.float64) + 1e-7
    d_inv_sqrt = deg ** -0.5
    return (d_inv_sqrt[rows] * d_inv_sqrt[cols]).astype(np.float32)


def knn_adj_edges(features: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, cols, values): each item connects to its top-k cosine
    neighbors; values = normalized laplacian."""
    n = features.shape[0]
    knn = cosine_knn(features, k)
    rows = np.repeat(np.arange(n, dtype=np.int32), k)
    cols = knn.reshape(-1)
    vals = normalized_laplacian_values(rows, cols, n)
    return rows, cols, vals


def cached_mm_edges(cache_dir: str, tag: str, k: int,
                    img_features: Optional[np.ndarray],
                    txt_features: Optional[np.ndarray],
                    image_weight: float = 0.5
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Blended image/text kNN adjacency (image_weight*img + (1-w)*txt),
    cached as .npz (same contract as FREEDOM's '_cache_mm_adj_*.pt')."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"_cache_mm_adj_{tag}_{k}_w{image_weight:g}.npz")
    if os.path.exists(path):
        blob = np.load(path)
        return blob["rows"], blob["cols"], blob["vals"]
    parts = []
    if img_features is not None:
        r, c, v = knn_adj_edges(img_features, k)
        parts.append((r, c, v * (image_weight if txt_features is not None else 1.0)))
    if txt_features is not None:
        r, c, v = knn_adj_edges(txt_features, k)
        parts.append((r, c, v * ((1.0 - image_weight) if img_features is not None else 1.0)))
    if not parts:
        raise ValueError("no multimodal features available")
    rows = np.concatenate([p[0] for p in parts])
    cols = np.concatenate([p[1] for p in parts])
    vals = np.concatenate([p[2] for p in parts])
    np.savez(path, rows=rows, cols=cols, vals=vals)
    return rows, cols, vals
