"""FREEDOM — frozen modality graph + degree-sensitive denoised UI graph.

Paper: Zhou & Shen, "A Tale of Two Graphs: Freezing and Denoising Graph
Structures for Multimodal Recommendation" (MM 2023).

Behavioral parity with reference skrec/recommender/FREEDOM.py:24-312: frozen
blended modality kNN adjacency (mm_image_weight*img + (1-w)*txt, disk-cached)
propagated over item-id embeddings for n_mm_layers; UI graph with per-epoch
degree-sensitive edge pruning keeping (1-dropout) of the edges via
multinomial-by-value (Gumbel top-k on device) + renormalization; n_ui_layers
mean-combined propagation; item output = i_g + mm-propagated h; BPR (mean) +
reg * (BPR of user emb vs projected text/image features); Adam; predict uses
the unpruned UI graph.
"""
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer, torch_layer_default
from ..ops.mm_graph import cached_mm_edges
from ..ops.sampling import gumbel_topk_without_replacement
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import PairwiseEpochPipeline

__all__ = ["FREEDOM", "FREEDOMConfig"]


class FREEDOMConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 0.0
    embed_dim: int = 64
    feat_dim: int = 64
    lambda_coeff: float = 0.9
    n_mm_layers: int = 1
    n_ui_layers: int = 2
    knn_k: int = 10
    mm_image_weight: float = 0.1
    dropout: float = 0.8
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"reg": [0.0, 1e-05, 1e-04, 1e-03], "dropout": [0.8, 0.9]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_dim, int) and self.embed_dim > 0
        assert isinstance(self.n_mm_layers, int) and self.n_mm_layers >= 0
        assert isinstance(self.n_ui_layers, int) and self.n_ui_layers > 0
        assert isinstance(self.knn_k, int) and self.knn_k > 0
        assert isinstance(self.dropout, float) and 0 <= self.dropout < 1
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class FREEDOM(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = FREEDOMConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users, num_items = self.num_users, self.num_items

        v_feat = self.dataset.img_features
        t_feat = self.dataset.txt_features

        # frozen blended modality kNN graph (disk-cached)
        cache_dir = os.path.join(self.dataset.data_dir, "_data_cache")
        mm_r, mm_c, mm_v = cached_mm_edges(cache_dir, "freedomdsp", cfg.knn_k,
                                           v_feat, t_feat, cfg.mm_image_weight)
        self._mm = (jnp.asarray(mm_r), jnp.asarray(mm_c), jnp.asarray(mm_v))

        pairs = self.dataset.train_data.to_user_item_pairs()
        ui_rows = jnp.asarray(pairs[:, 0].astype(np.int32))
        ui_cols = jnp.asarray(pairs[:, 1].astype(np.int32))
        n_edges = len(pairs)
        keep_len = int(n_edges * (1.0 - cfg.dropout))

        def normalize_values(rows, cols):
            ones = jnp.ones_like(rows, dtype=jnp.float32)
            row_sum = jax.ops.segment_sum(ones, rows, num_segments=num_users) + 1e-7
            col_sum = jax.ops.segment_sum(ones, cols, num_segments=num_items) + 1e-7
            return (row_sum[rows] ** -0.5) * (col_sum[cols] ** -0.5)

        base_values = normalize_values(ui_rows, ui_cols)

        def sym_edges(rows, cols, values):
            src = jnp.concatenate([cols + num_users, rows])
            dst = jnp.concatenate([rows, cols + num_users])
            return src, dst, jnp.concatenate([values, values])

        @jax.jit
        def full_edges():
            return sym_edges(ui_rows, ui_cols, base_values)

        @jax.jit
        def pruned_edges(key):
            keep = gumbel_topk_without_replacement(key, jnp.log(base_values),
                                                   keep_len)
            rows, cols = ui_rows[keep], ui_cols[keep]
            return sym_edges(rows, cols, normalize_values(rows, cols))

        from .common import mxu_msg_dtype, resolve_graph_impl
        impl = resolve_graph_impl(cfg.graph_impl, 2 * n_edges)
        if impl.startswith("mxu"):
            # Same mask-over-static-structure reformulation as LayerGCN:
            # per-epoch degree pruning becomes a renormalized edge mask.
            from ..ops.pallas.segsum_mxu import (mxu_graph_from_coo,
                                                 propagate_mxu)
            rows_np = pairs[:, 0].astype(np.int64)
            cols_np = pairs[:, 1].astype(np.int64)
            rd = np.bincount(rows_np, minlength=num_users) + 1e-7
            cd = np.bincount(cols_np, minlength=num_items) + 1e-7
            base_np = ((rd[rows_np] ** -0.5) * (cd[cols_np] ** -0.5)
                       ).astype(np.float32)
            g_ui = mxu_graph_from_coo(
                np.concatenate([cols_np + num_users, rows_np]),
                np.concatenate([rows_np, cols_np + num_users]),
                np.concatenate([base_np, base_np]), num_users + num_items,
                msg_dtype=mxu_msg_dtype(impl))
            g_mm = mxu_graph_from_coo(np.asarray(mm_c), np.asarray(mm_r),
                                      np.asarray(mm_v), num_items,
                msg_dtype=mxu_msg_dtype(impl))
            base_dev = jnp.asarray(base_np)

            @jax.jit
            def full_state():
                return jnp.ones(2 * n_edges, jnp.float32)

            @jax.jit
            def pruned_state(key):
                keep = gumbel_topk_without_replacement(key, jnp.log(base_values),
                                                       keep_len)
                ind = jnp.zeros(n_edges, jnp.float32).at[keep].set(1.0)
                row_sum = jax.ops.segment_sum(ind, ui_rows,
                                              num_segments=num_users) + 1e-7
                col_sum = jax.ops.segment_sum(ind, ui_cols,
                                              num_segments=num_items) + 1e-7
                val = ind * (row_sum[ui_rows] ** -0.5) * (col_sum[ui_cols] ** -0.5)
                half = val / base_dev
                return jnp.concatenate([half, half])

            self._full_edges = full_state
            self._pruned_edges = pruned_state

            def ui_step(x, state):
                return propagate_mxu(g_ui, x, state)

            def mm_step(h):
                return propagate_mxu(g_mm, h)
        else:
            self._full_edges = full_edges
            self._pruned_edges = pruned_edges

            def ui_step(x, state):
                src, dst, w = state
                return jax.ops.segment_sum(x[src] * w[:, None], dst,
                                           num_segments=num_users + num_items)

            mm_r_s, mm_c_s, mm_v_s = self._mm

            def mm_step(h):
                return jax.ops.segment_sum(h[mm_c_s] * mm_v_s[:, None],
                                           mm_r_s, num_segments=num_items)

        xavier = get_initializer("xavier_uniform")
        keys = jax.random.split(jax.random.key(run_config.seed), 5)
        d = cfg.embed_dim
        self.params = {
            "user_emb": xavier(keys[0], (num_users, d)),
            "item_emb": xavier(keys[1], (num_items, d)),
        }
        # trs Linears keep torch's default U(+-1/sqrt(fan_in)) weight and
        # bias — the reference only xavier-inits the embedding tables
        # (FREEDOM.py:95-97)
        def lin(key, d_in, d_out):
            kw, kb = jax.random.split(key)
            return {"w": torch_layer_default(kw, (d_in, d_out), d_in),
                    "b": torch_layer_default(kb, (d_out,), d_in)}

        if v_feat is not None:
            self.params["v_feat"] = jnp.asarray(v_feat.astype(np.float32))
            self.params["image_trs"] = lin(keys[2], v_feat.shape[1],
                                           cfg.feat_dim)
        if t_feat is not None:
            self.params["t_feat"] = jnp.asarray(t_feat.astype(np.float32))
            self.params["text_trs"] = lin(keys[3], t_feat.shape[1],
                                          cfg.feat_dim)
        has_v, has_t = v_feat is not None, t_feat is not None

        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        n_mm, n_ui, reg_w = cfg.n_mm_layers, cfg.n_ui_layers, cfg.reg

        def forward(p, prop_state):
            h = p["item_emb"]
            for _ in range(n_mm):
                h = mm_step(h)
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            x = ego
            for _ in range(n_ui):
                x = ui_step(x, prop_state)
                layers.append(x)
            combined = jnp.mean(jnp.stack(layers, axis=1), axis=1)
            return combined[:num_users], combined[num_users:] + h

        self._forward = forward

        def bpr_mean(u, pos, neg, w_b):
            y_pos = jnp.sum(u * pos, -1)
            y_neg = jnp.sum(u * neg, -1)
            return -jnp.sum(jax.nn.log_sigmoid(y_pos - y_neg) * w_b) \
                / jnp.maximum(jnp.sum(w_b), 1.0)

        def train_step(carry, batch):
            params, opt_state, prop_state = carry
            users, pos, neg, w_b = batch
            neg = neg[:, 0]

            def loss_fn(p):
                u_all, i_all = forward(p, prop_state)
                loss = bpr_mean(u_all[users], i_all[pos], i_all[neg], w_b)
                mm_loss = 0.0
                if has_t:
                    t = p["t_feat"] @ p["text_trs"]["w"] + p["text_trs"]["b"]
                    mm_loss += bpr_mean(u_all[users], t[pos], t[neg], w_b)
                if has_v:
                    v = p["v_feat"] @ p["image_trs"]["w"] + p["image_trs"]["b"]
                    mm_loss += bpr_mean(u_all[users], v[pos], v[neg], w_b)
                return loss + reg_w * mm_loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, prop_state), loss

        self._train_step = train_step
        self._finalize_setup(run_config.seed)
        self._final = None

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        k_prune, k_epoch = jax.random.split(key)
        edges = self._pruned_edges(k_prune) if self.config.dropout > 0 \
            else self._full_edges()
        carry = (self.params, self.opt_state, edges)
        (self.params, self.opt_state, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._train_step)
        return float(loss)

    def evaluate(self, test_users=None):
        self._final = self._forward(self.params, self._full_edges())
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final is None:
            self._final = self._forward(self.params, self._full_edges())
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        if self._final is None:
            self._final = self._forward(self.params, self._full_edges())
        return self._final
