"""LightGCN — simplified graph convolution for collaborative filtering.

Paper: He et al., "LightGCN: Simplifying and Powering Graph Convolution
Network for Recommendation" (SIGIR 2020).

Behavioral parity with reference skrec/recommender/LightGCN.py:30-216:
xavier_uniform init; bipartite adjacency in plain/norm/gcmc/pre variants
cached under ``_LightGCN_data/`` as .npz; per-step full-graph K-layer
propagation with mean layer combination; mean BPR + reg*L2/batch_size;
embeddings frozen once per evaluation for predict (LightGCN.py:109-111).

TPU re-design: ``torch.sparse.mm`` becomes gather + segment-sum over a
static COO edge list (skrx/ops/graph.py); the whole epoch runs as one jitted
`lax.scan` with on-device negative sampling. With a multi-device mesh
(RunConfig.mesh_shape) the embedding tables are row-sharded over the mesh
and every propagation runs edge-partitioned under shard_map
(skrx/parallel/graph_shard.py) — numerics identical to single-device
(tests/test_sharded_graph_models.py).
"""
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import bpr_loss, get_initializer
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig, normalize_adj_matrix
from .common import (ChunkedDotPredictMixin, EpochTrainedRecommender,
                     build_prop_graph)
from .pipeline import PairwiseEpochPipeline

__all__ = ["LightGCN", "LightGCNConfig"]


class LightGCNConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-3
    embed_size: int = 64
    n_layers: int = 3
    adj_type: str = "pre"   # plain | norm | gcmc | pre
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 1024
    epochs: int = 1000
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert isinstance(self.n_layers, int) and self.n_layers > 0
        assert self.adj_type in {"plain", "norm", "gcmc", "pre"}
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert isinstance(self.epochs, int) and self.epochs >= 0
        assert isinstance(self.early_stop, int)


def build_bipartite_adj(user_item_pairs: np.ndarray, num_users: int,
                        num_items: int, adj_type: str) -> sp.csr_matrix:
    """The four adjacency variants of LightGCN.py:141-169."""
    users, items = user_item_pairs[:, 0], user_item_pairs[:, 1]
    ones = np.ones(len(users), dtype=np.float32)
    n = num_users + num_items
    upper = sp.csr_matrix((ones, (users, items + num_users)), shape=(n, n))
    adj = upper + upper.T
    if adj_type == "plain":
        return adj.tocsr()
    if adj_type == "norm":
        return normalize_adj_matrix(adj + sp.eye(n), norm_method="left")
    if adj_type == "gcmc":
        return normalize_adj_matrix(adj, norm_method="left")
    if adj_type == "pre":
        return normalize_adj_matrix(adj, norm_method="symmetric")
    raise ValueError(adj_type)


class LightGCN(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = LightGCNConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items

        adj = self._load_adj_mat(cfg.adj_type)
        # with a >1-device mesh the propagation itself is sharded: edges
        # partitioned by destination over all mesh axes, one all-gather per
        # layer (skrx/parallel/graph_shard.py) — the multi-chip answer to
        # the reference's single-GPU torch.sparse.mm (LightGCN.py:89-100)
        self.graph = build_prop_graph(adj, cfg.graph_impl, mesh=self.mesh)

        init = get_initializer("xavier_uniform")
        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {
            "user_emb": init(k_u, (self.num_users, cfg.embed_size)),
            "item_emb": init(k_i, (self.num_items, cfg.embed_size)),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        n_layers, reg, batch_size = cfg.n_layers, cfg.reg, cfg.batch_size
        num_users = self.num_users
        graph = self.graph

        def forward_gcn(p):
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            h = ego
            for _ in range(n_layers):
                h = propagate(graph, h)
                layers.append(h)
            combined = jnp.mean(jnp.stack(layers, axis=1), axis=1)
            return combined[:num_users], combined[num_users:]

        self._forward_gcn = jax.jit(forward_gcn)

        def loss_fn(p, batch):
            users, pos, neg, w = batch
            neg = neg[:, 0]
            u_all, i_all = forward_gcn(p)
            ue, pe, ne = u_all[users], i_all[pos], i_all[neg]
            y_pos = jnp.sum(ue * pe, -1)
            y_neg = jnp.sum(ue * ne, -1)
            n_valid = jnp.maximum(jnp.sum(w), 1.0)
            loss = jnp.sum(bpr_loss(y_pos, y_neg) * w) / n_valid
            # reg on the EGO embeddings (not propagated), LightGCN.py:120-123
            reg_term = 0.5 * jnp.sum(jnp.sum(
                p["user_emb"][users] ** 2 + p["item_emb"][pos] ** 2
                + p["item_emb"][neg] ** 2, -1) * w)
            return loss + reg * reg_term / batch_size

        from .common import graph_param_shardings, graph_sharding_enabled
        shardings = (graph_param_shardings(self.mesh, self.params)
                     if graph_sharding_enabled(self.mesh) else None)
        self._finalize_setup_flat(run_config.seed, loss_fn,
                                  param_shardings=shardings)
        self._final_emb = None

    def _load_adj_mat(self, adj_type: str) -> sp.csr_matrix:
        out_dir = os.path.join(self.dataset.data_dir,
                               f"_{type(self).__name__}_data")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{adj_type}_adj.npz")
        if os.path.exists(path):
            return sp.load_npz(path)
        adj = build_bipartite_adj(self.dataset.train_data.to_user_item_pairs(),
                                  self.num_users, self.num_items, adj_type)
        sp.save_npz(path, adj)
        return adj

    def evaluate(self, test_users=None):
        # freeze propagated embeddings for this evaluation (eval-mode parity)
        self._final_emb = self._forward_gcn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final_emb is None:
            self._final_emb = self._forward_gcn(self.params)
        u_all, i_all = self._final_emb
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        if self._final_emb is None:
            self._final_emb = self._forward_gcn(self.params)
        return self._final_emb
