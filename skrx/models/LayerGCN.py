"""LayerGCN — layer-refined graph convolution with edge pruning.

Paper: Zhou et al., "Layer-refined Graph Convolutional Networks for
Recommendation" (ICDE 2023).

Behavioral parity with reference skrec/recommender/LayerGCN.py:24-314:
xavier_uniform init; symmetric-normalized adjacency with 1e-7 degree eps;
per-epoch edge pruning keeping (1-dropout) of the UI edges, alternating
between degree-sensitive sampling (multinomial by edge value, without
replacement — realized on device with Gumbel top-k) and uniform random
pruning, with renormalization of the kept edges; layer-refined propagation
h_l weighted by cos(h_l, ego) per node, layers summed (ego excluded); summed
BPR + reg*L2 on ego batch embeddings; Adam; predict uses the unpruned graph.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer
from ..ops.sampling import gumbel_topk_without_replacement
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import PairwiseEpochPipeline

__all__ = ["LayerGCN", "LayerGCNConfig"]


class LayerGCNConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-2
    embed_dim: int = 64
    n_layers: int = 4
    dropout: float = 0.0
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"n_layers": [4],
                "reg": [1e-02, 1e-03, 1e-04, 1e-05],
                "dropout": [0.0, 0.1, 0.2]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_dim, int) and self.embed_dim > 0
        assert isinstance(self.n_layers, int) and self.n_layers > 0
        assert isinstance(self.dropout, float) and 0 <= self.dropout < 1
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class LayerGCN(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = LayerGCNConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users, num_items = self.num_users, self.num_items

        pairs = self.dataset.train_data.to_user_item_pairs()
        ui_rows = jnp.asarray(pairs[:, 0].astype(np.int32))   # users
        ui_cols = jnp.asarray(pairs[:, 1].astype(np.int32))   # items
        self._n_edges = len(pairs)
        keep_len = int(self._n_edges * (1.0 - cfg.dropout))

        def normalize_values(rows, cols):
            """1/sqrt(rowdeg*coldeg) with 1e-7 eps (LayerGCN.py:147-157)."""
            ones = jnp.ones_like(rows, dtype=jnp.float32)
            row_sum = jax.ops.segment_sum(ones, rows, num_segments=num_users) + 1e-7
            col_sum = jax.ops.segment_sum(ones, cols, num_segments=num_items) + 1e-7
            return (row_sum[rows] ** -0.5) * (col_sum[cols] ** -0.5)

        base_values = normalize_values(ui_rows, ui_cols)

        def sym_edges(rows, cols, values):
            """Bidirectional (src, dst, w) node-graph edges; items offset."""
            src = jnp.concatenate([cols + num_users, rows])
            dst = jnp.concatenate([rows, cols + num_users])
            w = jnp.concatenate([values, values])
            return src, dst, w

        @jax.jit
        def full_edges():
            return sym_edges(ui_rows, ui_cols, base_values)

        @jax.jit
        def pruned_edges_by_degree(key):
            keep = gumbel_topk_without_replacement(key, jnp.log(base_values),
                                                   keep_len)
            rows, cols = ui_rows[keep], ui_cols[keep]
            return sym_edges(rows, cols, normalize_values(rows, cols))

        @jax.jit
        def pruned_edges_random(key):
            keep = jax.random.permutation(key, self._n_edges)[:keep_len]
            rows, cols = ui_rows[keep], ui_cols[keep]
            return sym_edges(rows, cols, normalize_values(rows, cols))

        from .common import (graph_sharding_enabled, mxu_msg_dtype,
                             resolve_graph_impl)
        impl = resolve_graph_impl(cfg.graph_impl, 2 * self._n_edges)
        self._graph_impl = impl
        sharded = graph_sharding_enabled(self.mesh)
        if sharded or impl.startswith("mxu"):
            # Static symmetric node-graph structure; per-epoch pruning becomes
            # an edge MASK: kept-edge indicator with on-device degree
            # renormalization, divided by the baked base weights so
            # base * mask == the pruned-subgraph normalization. The same
            # formulation serves the mesh-sharded path: the edge partition
            # (skrx/parallel/graph_shard.py) never changes, only the
            # replicated (2E,) mask.
            rows_np = pairs[:, 0].astype(np.int64)
            cols_np = pairs[:, 1].astype(np.int64)
            rd = np.bincount(rows_np, minlength=num_users) + 1e-7
            cd = np.bincount(cols_np, minlength=num_items) + 1e-7
            base_np = ((rd[rows_np] ** -0.5) * (cd[cols_np] ** -0.5)
                       ).astype(np.float32)
            src_np = np.concatenate([cols_np + num_users, rows_np])
            dst_np = np.concatenate([rows_np, cols_np + num_users])
            if sharded:
                from ..parallel.graph_shard import ShardedPropGraph
                g_sharded = ShardedPropGraph(
                    self.mesh, coo_edges=(src_np, dst_np,
                                          np.concatenate([base_np, base_np])),
                    num_nodes=num_users + num_items,
                    graph_impl=cfg.graph_impl)
            else:
                from ..ops.pallas.segsum_mxu import (mxu_graph_from_coo,
                                                     propagate_mxu)
                g_static = mxu_graph_from_coo(
                    src_np, dst_np, np.concatenate([base_np, base_np]),
                    num_users + num_items, msg_dtype=mxu_msg_dtype(impl))
            base_dev = jnp.asarray(base_np)

            def _mask_from_keep(keep_idx):
                ind = jnp.zeros(self._n_edges, jnp.float32).at[keep_idx].set(1.0)
                row_sum = jax.ops.segment_sum(ind, ui_rows,
                                              num_segments=num_users) + 1e-7
                col_sum = jax.ops.segment_sum(ind, ui_cols,
                                              num_segments=num_items) + 1e-7
                val = ind * (row_sum[ui_rows] ** -0.5) * (col_sum[ui_cols] ** -0.5)
                half = val / base_dev
                return jnp.concatenate([half, half])

            @jax.jit
            def full_state():
                return jnp.ones(2 * self._n_edges, jnp.float32)

            @jax.jit
            def pruned_state_by_degree(key):
                keep = gumbel_topk_without_replacement(key, jnp.log(base_values),
                                                       keep_len)
                return _mask_from_keep(keep)

            @jax.jit
            def pruned_state_random(key):
                keep = jax.random.permutation(key, self._n_edges)[:keep_len]
                return _mask_from_keep(keep)

            self._full_edges = full_state
            self._pruned_by_degree = pruned_state_by_degree
            self._pruned_random = pruned_state_random

            if sharded:
                def prop_step(h, state):
                    return g_sharded.prop(h, state)
            else:
                def prop_step(h, state):
                    return propagate_mxu(g_static, h, state)
        else:
            self._full_edges = full_edges
            self._pruned_by_degree = pruned_edges_by_degree
            self._pruned_random = pruned_edges_random

            def prop_step(h, state):
                src, dst, w = state
                return jax.ops.segment_sum(h[src] * w[:, None], dst,
                                           num_segments=num_users + num_items)

        init = get_initializer("xavier_uniform")
        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {"user_emb": init(k_u, (num_users, cfg.embed_dim)),
                       "item_emb": init(k_i, (num_items, cfg.embed_dim))}
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        n_layers, reg = cfg.n_layers, cfg.reg

        def forward(p, prop_state):
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            h = ego
            total = jnp.zeros_like(ego)
            for _ in range(n_layers):
                h = prop_step(h, prop_state)
                cos_w = jnp.sum(h * ego, -1) / (
                    jnp.linalg.norm(h, axis=-1) * jnp.linalg.norm(ego, axis=-1)
                    + 1e-12)
                h = cos_w[:, None] * h
                total = total + h
            return total[:num_users], total[num_users:]

        self._forward = forward

        def train_step(carry, batch):
            params, opt_state, prop_state = carry
            users, pos, neg, w_b = batch
            neg = neg[:, 0]

            def loss_fn(p):
                u_all, i_all = forward(p, prop_state)
                y_pos = jnp.sum(u_all[users] * i_all[pos], -1)
                y_neg = jnp.sum(u_all[users] * i_all[neg], -1)
                loss = jnp.sum(-jax.nn.log_sigmoid(y_pos - y_neg) * w_b)
                reg_term = 0.5 * jnp.sum(jnp.sum(
                    p["user_emb"][users] ** 2 + p["item_emb"][pos] ** 2
                    + p["item_emb"][neg] ** 2, -1) * w_b)
                return loss + reg * reg_term

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, prop_state), loss

        self._train_step = train_step
        self._finalize_setup(run_config.seed)
        self._final_emb = None

    def _epoch_edges(self, key, epoch: int):
        if self.config.dropout <= 0.0:
            return self._full_edges()
        # alternation derived from the epoch index (degree-sensitive first,
        # LayerGCN.py:133-152) so checkpoint resume stays deterministic
        if epoch % 2 == 1:
            return self._pruned_random(key)
        return self._pruned_by_degree(key)

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        k_prune, k_epoch = jax.random.split(key)
        edges = self._epoch_edges(k_prune, epoch)
        carry = (self.params, self.opt_state, edges)
        (self.params, self.opt_state, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._train_step)
        return float(loss)

    def evaluate(self, test_users=None):
        u_all, i_all = self._forward(self.params, self._full_edges())
        self._final_emb = (u_all, i_all)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final_emb is None:
            self._final_emb = self._forward(self.params, self._full_edges())
        u_all, i_all = self._final_emb
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        if self._final_emb is None:
            self._final_emb = self._forward(self.params, self._full_edges())
        return self._final_emb
