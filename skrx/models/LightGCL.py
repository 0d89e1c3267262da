"""LightGCL — graph contrastive learning with SVD-augmented views.

Paper: Cai et al., "LightGCL: Simple Yet Effective Graph Contrastive Learning
for Recommendation" (ICLR 2023).

Behavioral parity with reference skrec/recommender/LightGCL.py:24-250:
bipartite R normalized by 1/sqrt(rowDeg*colDeg); cross propagation
Z_u[l] = R E_i[l-1], Z_i[l] = R^T E_u[l-1]; rank-q SVD branch
G_u[l] = (U S)(V^T E_i[l-1]); layer sums (including layer 0); InfoNCE-style
CL between the SVD view and the GCN view with +-5 clamped positive logits;
mean BPR; lambda2 * sum of squared param norms; Adam. ``torch.svd_lowrank``
becomes scipy.sparse.linalg.svds host-side (one-time).

graph_impl="mxu" (default on TPU) runs R / R^T propagation through the
Pallas MXU scatter kernel (skrx/ops/pallas/segsum_mxu.py, rectangular
form). Forward outputs match the segment path to ~1e-6; end-of-training
metrics can drift ~1e-2 relative through the InfoNCE losses (float
reassociation amplified over epochs), same class of deviation as the
chunked-eval sliced matmuls.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp
from scipy.sparse.linalg import svds

from ..ops import get_initializer
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import ChunkedDotPredictMixin, EpochTrainedRecommender, make_train_step
from .pipeline import PairwiseEpochPipeline

__all__ = ["LightGCL", "LightGCLConfig"]


class LightGCLConfig(ModelConfig):
    lr: float = 1e-3
    lambda1: float = 0.2     # CL loss weight
    d: int = 64
    gnn_layer: int = 2
    batch_size: int = 2048
    svd_q: int = 5
    dropout: float = 0.0
    temp: float = 0.2
    lambda2: float = 1e-7    # L2 reg weight
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.lambda1, float) and self.lambda1 >= 0
        assert isinstance(self.d, int) and self.d > 0
        assert isinstance(self.gnn_layer, int) and self.gnn_layer > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert isinstance(self.svd_q, int) and self.svd_q > 0
        assert isinstance(self.dropout, float) and self.dropout >= 0
        assert isinstance(self.temp, float) and self.temp > 0
        assert isinstance(self.lambda2, float) and self.lambda2 >= 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS


class LightGCL(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = LightGCLConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items

        coo = self.dataset.train_data.to_coo_matrix().astype(np.float64)
        coo.data[:] = 1.0
        row_deg = np.asarray(coo.sum(axis=1)).flatten()
        col_deg = np.asarray(coo.sum(axis=0)).flatten()
        norm_data = coo.data / np.sqrt(
            np.maximum(row_deg[coo.row] * col_deg[coo.col], 1e-12))
        adj = sp.coo_matrix((norm_data, (coo.row, coo.col)), shape=coo.shape)

        # rank-q SVD of the normalized bipartite adjacency (host, one-time)
        q = min(cfg.svd_q, min(adj.shape) - 1)
        svd_u, s, svd_vt = svds(adj.tocsc().astype(np.float64), k=q)
        self._u_mul_s = jnp.asarray((svd_u * s).astype(np.float32))       # (U, q)
        self._v_mul_s = jnp.asarray((svd_vt.T * s).astype(np.float32))    # (I, q)
        self._ut = jnp.asarray(svd_u.T.astype(np.float32))                # (q, U)
        self._vt = jnp.asarray(svd_vt.astype(np.float32))                 # (q, I)

        self._e_row = jnp.asarray(coo.row.astype(np.int32))
        self._e_col = jnp.asarray(coo.col.astype(np.int32))
        self._e_w = jnp.asarray(norm_data.astype(np.float32))

        init = get_initializer("xavier_uniform")
        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {"E_u_0": init(k_u, (self.num_users, cfg.d)),
                       "E_i_0": init(k_i, (self.num_items, cfg.d))}
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        n_layers, temp = cfg.gnn_layer, cfg.temp
        lambda1, lambda2, dropout = cfg.lambda1, cfg.lambda2, cfg.dropout
        num_users, num_items = self.num_users, self.num_items
        e_row, e_col, e_w = self._e_row, self._e_col, self._e_w
        u_mul_s, v_mul_s, ut, vt = (self._u_mul_s, self._v_mul_s, self._ut,
                                    self._vt)

        from .common import (graph_sharding_enabled, mxu_msg_dtype,
                             resolve_graph_impl)
        impl = resolve_graph_impl(cfg.graph_impl, len(coo.data))
        if graph_sharding_enabled(self.mesh):
            # Mesh-sharded path: both directions fused into ONE square
            # bipartite propagate A=[[0,R],[R^T,0]] on x=[e_u; e_i]
            # (edge-partitioned over the mesh, skrx/parallel/graph_shard.py).
            # Edge ids 0..E-1 are the R direction and E..2E-1 the R^T
            # direction, so the reference's two INDEPENDENT dropout masks
            # (LightGCL.py:119-120) concatenate into one (2E,) mask.
            from ..parallel.graph_shard import ShardedPropGraph
            w32 = norm_data.astype(np.float32)
            src_cat = np.concatenate([coo.col + num_users, coo.row])
            dst_cat = np.concatenate([coo.row, coo.col + num_users])
            g_sq = ShardedPropGraph(
                self.mesh, coo_edges=(src_cat, dst_cat,
                                      np.concatenate([w32, w32])),
                num_nodes=num_users + num_items, graph_impl=cfg.graph_impl)

            def prop_pair(x_u, x_i, mask_u, mask_i):
                x = jnp.concatenate([x_u, x_i], axis=0)
                mask = (None if mask_u is None
                        else jnp.concatenate([mask_u, mask_i]))
                out = g_sq.prop(x, mask)
                return out[:num_users], out[num_users:]
        elif impl.startswith("mxu"):
            # rectangular R lowered for the MXU scatter kernel; R^T shares
            # buffers (and edge ids, so one dropout mask drives both)
            from ..ops.pallas.segsum_mxu import (mxu_graph_from_coo,
                                                 propagate_mxu,
                                                 transpose_mxu_graph)
            g_r = mxu_graph_from_coo(coo.col, coo.row,
                                     norm_data.astype(np.float32),
                                     num_users, num_src_nodes=num_items,
                msg_dtype=mxu_msg_dtype(impl))
            g_rt = transpose_mxu_graph(g_r)

            def prop_u(x_i, mask):  # R @ x_i
                return propagate_mxu(g_r, x_i, mask)

            def prop_i(x_u, mask):  # R^T @ x_u
                return propagate_mxu(g_rt, x_u, mask)
        else:
            def prop_u(x_i, mask):  # R @ x_i
                w = e_w if mask is None else e_w * mask
                return jax.ops.segment_sum(x_i[e_col] * w[:, None], e_row,
                                           num_segments=num_users)

            def prop_i(x_u, mask):  # R^T @ x_u
                w = e_w if mask is None else e_w * mask
                return jax.ops.segment_sum(x_u[e_row] * w[:, None], e_col,
                                           num_segments=num_items)

        if not graph_sharding_enabled(self.mesh):
            def prop_pair(x_u, x_i, mask_u, mask_i):
                return prop_u(x_i, mask_u), prop_i(x_u, mask_i)

        def forward(p, key=None):
            e_u, e_i = p["E_u_0"], p["E_i_0"]
            sum_eu, sum_ei = e_u, e_i
            sum_gu, sum_gi = e_u, e_i
            for _ in range(n_layers):
                mask_u = mask_i = None
                if key is not None and dropout > 0:
                    # two INDEPENDENT masks: the reference draws
                    # sparse_dropout separately for Z_u and Z_i
                    # (LightGCL.py:119-120)
                    key, s_u, s_i = jax.random.split(key, 3)
                    keep_u = jax.random.bernoulli(s_u, 1 - dropout, e_w.shape)
                    keep_i = jax.random.bernoulli(s_i, 1 - dropout, e_w.shape)
                    mask_u = keep_u.astype(jnp.float32) / (1 - dropout)
                    mask_i = keep_i.astype(jnp.float32) / (1 - dropout)
                g_u = u_mul_s @ (vt @ e_i)
                g_i = v_mul_s @ (ut @ e_u)
                e_u, e_i = prop_pair(e_u, e_i, mask_u, mask_i)
                sum_eu, sum_ei = sum_eu + e_u, sum_ei + e_i
                sum_gu, sum_gi = sum_gu + g_u, sum_gi + g_i
            return sum_eu, sum_ei, sum_gu, sum_gi

        def loss_fn(p, batch, key):
            users, pos, neg, w_b = batch
            neg = neg[:, 0]
            E_u, E_i, G_u, G_i = forward(p, key)

            loss_s = 0.0
            if lambda1 > 0:
                iids = jnp.concatenate([pos, neg])
                w_ii = jnp.concatenate([w_b, w_b])
                n_u = jnp.maximum(jnp.sum(w_b), 1.0)
                n_i = jnp.maximum(jnp.sum(w_ii), 1.0)
                neg_score = jnp.sum(jnp.log(jnp.sum(
                    jnp.exp(G_u[users] @ E_u.T / temp), 1) + 1e-8) * w_b) / n_u
                neg_score += jnp.sum(jnp.log(jnp.sum(
                    jnp.exp(G_i[iids] @ E_i.T / temp), 1) + 1e-8) * w_ii) / n_i
                pos_score = jnp.sum(jnp.clip(
                    jnp.sum(G_u[users] * E_u[users], 1) / temp, -5.0, 5.0) * w_b) / n_u
                pos_score += jnp.sum(jnp.clip(
                    jnp.sum(G_i[iids] * E_i[iids], 1) / temp, -5.0, 5.0) * w_ii) / n_i
                loss_s = lambda1 * (-pos_score + neg_score)

            y_pos = jnp.sum(E_u[users] * E_i[pos], -1)
            y_neg = jnp.sum(E_u[users] * E_i[neg], -1)
            n_valid = jnp.maximum(jnp.sum(w_b), 1.0)
            loss_r = -jnp.sum(jax.nn.log_sigmoid(y_pos - y_neg) * w_b) / n_valid

            loss_reg = lambda2 * (jnp.sum(p["E_u_0"] ** 2)
                                  + jnp.sum(p["E_i_0"] ** 2))
            return loss_r + loss_s + loss_reg

        def train_step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        self._step_with_key = train_step
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)

        @jax.jit
        def embeddings_fn(p):
            E_u, E_i, _, _ = forward(p, None)
            return E_u, E_i

        self._embeddings_fn = embeddings_fn
        self._final = None

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        # independent streams: the pipeline consumes k_epoch for shuffling/
        # negatives; the carry key drives in-step dropout
        k_epoch, k_carry = jax.random.split(key)
        carry = (self.params, self.opt_state, k_carry)
        (self.params, self.opt_state, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._step_with_key)
        return float(loss)

    def evaluate(self, test_users=None):
        self._final = self._embeddings_fn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        E_u, E_i = self._chunk_embeddings()
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return E_u[users] @ E_i.T

    def _chunk_embeddings(self):
        if getattr(self, "_final", None) is None:
            self._final = self._embeddings_fn(self.params)
        return self._final
