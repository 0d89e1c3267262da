"""MGCN — multi-view graph convolutional network for multimodal rec.

Paper: Yu et al., "Multi-View Graph Convolutional Network for Multimedia
Recommendation" (MM 2023).

Behavioral parity with reference skrec/recommender/MGCN.py:25-413:
behavior-guided purifier (item-id embedding gated by projected modality
features); user-item LightGCN view over the sym-normalized bipartite graph;
per-modality item-item views on weighted kNN graphs (sym-normalized by value
degree, disk-cached) lifted to users through the normalized rating block R;
behavior-aware fuser — attention over the common part (shared 2-layer query
net), preference gates for the separate parts, side = (sep_v + sep_t +
common)/3; final = content + side; mean BPR + reg*L2/batch + cl_loss *
(InfoNCE(side_items, content_items | pos) + InfoNCE(side_users,
content_users | users)) at temperature 0.5... 0.2 per the call site; Adam.

Includes the reference's per-epoch LambdaLR decay (lr * 0.96^(epoch/50), MGCN.py:372-397) as a step schedule inside opt_state. Deviation: padded rows of the final partial batch are excluded from the InfoNCE denominators (the reference's exact partial batches never contain them).
"""
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import get_initializer, torch_layer_default
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import PairwiseEpochPipeline

__all__ = ["MGCN", "MGCNConfig"]


class MGCNConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-4
    embed_dim: int = 64
    n_ui_layers: int = 2
    n_layers: int = 1
    lambda_coeff: float = 0.9
    knn_k: int = 10
    cl_loss: float = 0.001
    lr_scheduler: Optional[List[float]] = None   # default [0.96, 50]
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"cl_loss": [0.001, 0.01, 0.1]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_dim, int) and self.embed_dim > 0
        if self.lr_scheduler is None:
            self.lr_scheduler = [0.96, 50]
        assert isinstance(self.lr_scheduler, list) and len(self.lr_scheduler) == 2
        assert isinstance(self.knn_k, int) and self.knn_k > 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _weighted_knn_edges(features: np.ndarray, k: int):
    """Weighted kNN adjacency, sym-normalized by value degree
    (MGCN.py:66-115)."""
    n = features.shape[0]
    norm = features / (np.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    sim = norm @ norm.T
    # top-k from the already-materialized similarity (argpartition + exact
    # order), instead of cosine_knn recomputing the dense N x N matrix
    part = np.argpartition(-sim, kth=min(k, n - 1), axis=-1)[:, :k]
    rr = np.arange(n)[:, None]
    order = np.argsort(-sim[rr, part], axis=-1)
    knn = part[rr, order].astype(np.int32)
    rows = np.repeat(np.arange(n, dtype=np.int32), k)
    cols = knn.reshape(-1)
    vals = sim[rows, cols].astype(np.float64)
    deg = np.zeros(n)
    np.add.at(deg, rows, vals)
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(deg, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    vals = (d_inv_sqrt[rows] * vals * d_inv_sqrt[cols]).astype(np.float32)
    return rows, cols, vals


class MGCN(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = MGCNConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users, num_items = self.num_users, self.num_items

        v_feat = self.dataset.img_features
        t_feat = self.dataset.txt_features
        assert v_feat is not None and t_feat is not None, \
            "MGCN requires both image and text features"

        # sym-normalized bipartite adjacency + its user-item block R
        pairs = self.dataset.train_data.to_user_item_pairs()
        n = num_users + num_items
        ones = np.ones(len(pairs), dtype=np.float64)
        upper = sp.csr_matrix((ones, (pairs[:, 0], pairs[:, 1] + num_users)),
                              shape=(n, n))
        adj = (upper + upper.T).tocsr()
        deg = np.asarray(adj.sum(axis=1)).flatten()
        with np.errstate(divide="ignore"):
            d_inv_sqrt = np.power(deg, -0.5)
        d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
        norm_adj = sp.diags(d_inv_sqrt) @ adj @ sp.diags(d_inv_sqrt)
        norm_coo = sp.coo_matrix(norm_adj)
        self._adj = (jnp.asarray(norm_coo.col.astype(np.int32)),
                     jnp.asarray(norm_coo.row.astype(np.int32)),
                     jnp.asarray(norm_coo.data.astype(np.float32)))
        r_coo = sp.coo_matrix(norm_adj.tocsr()[:num_users, num_users:])
        self._R = (jnp.asarray(r_coo.col.astype(np.int32)),   # item idx
                   jnp.asarray(r_coo.row.astype(np.int32)),   # user idx
                   jnp.asarray(r_coo.data.astype(np.float32)))

        # cached weighted modality kNN graphs
        cache_dir = os.path.join(self.dataset.data_dir, "_data_cache")
        os.makedirs(cache_dir, exist_ok=True)

        def cached_edges(feats, tag):
            path = os.path.join(cache_dir, f"{tag}_mgcn_adj_{cfg.knn_k}.npz")
            if os.path.exists(path):
                blob = np.load(path)
                return (jnp.asarray(blob["rows"]), jnp.asarray(blob["cols"]),
                        jnp.asarray(blob["vals"]))
            rows, cols, vals = _weighted_knn_edges(feats, cfg.knn_k)
            np.savez(path, rows=rows, cols=cols, vals=vals)
            return jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)

        self._img_adj = cached_edges(v_feat, "image")
        self._txt_adj = cached_edges(t_feat, "text")

        xavier = get_initializer("xavier_uniform")
        glorot = jax.nn.initializers.glorot_uniform()
        keys = jax.random.split(jax.random.key(run_config.seed), 12)
        d = cfg.embed_dim

        def lin(key, d_in, d_out, bias=True):
            # the reference re-inits only the embedding tables
            # (MGCN.py:140-142); trs/gate/query Linears keep torch's default
            # U(+-1/sqrt(fan_in)) weight AND bias
            kw, kb = jax.random.split(key)
            p = {"w": torch_layer_default(kw, (d_in, d_out), d_in)}
            if bias:
                p["b"] = torch_layer_default(kb, (d_out,), d_in)
            return p

        self.params = {
            "user_emb": xavier(keys[0], (num_users, d)),
            "item_emb": xavier(keys[1], (num_items, d)),
            "v_feat": jnp.asarray(v_feat.astype(np.float32)),
            "t_feat": jnp.asarray(t_feat.astype(np.float32)),
            "image_trs": lin(keys[2], v_feat.shape[1], d),
            "text_trs": lin(keys[3], t_feat.shape[1], d),
            "query1": lin(keys[4], d, d),
            "query2": lin(keys[5], d, 1, bias=False),
            "gate_v": lin(keys[6], d, d),
            "gate_t": lin(keys[7], d, d),
            "gate_image_prefer": lin(keys[8], d, d),
            "gate_text_prefer": lin(keys[9], d, d),
        }
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        # per-epoch LambdaLR parity: lr * rate ** (epoch / period)
        # (reference MGCN.py:372-375, stepped each epoch at :397); expressed
        # as a step schedule so it checkpoints inside opt_state
        rate, period = cfg.lr_scheduler
        spe = self.pipeline.num_batches
        lr0 = cfg.lr

        def _lr(step):
            return lr0 * rate ** ((step // spe) / period)

        self.optimizer = optax.adam(learning_rate=_lr)
        n_ui, n_mm, reg_w, cl_w = (cfg.n_ui_layers, cfg.n_layers, cfg.reg,
                                   cfg.cl_loss)
        adj_src, adj_dst, adj_w = self._adj
        r_src, r_dst, r_w = self._R
        img_r, img_c, img_v = self._img_adj
        txt_r, txt_c, txt_v = self._txt_adj

        from .common import mxu_msg_dtype, resolve_graph_impl
        impl = resolve_graph_impl(cfg.graph_impl, int(np.asarray(adj_w).size))
        if impl.startswith("mxu"):
            # all four propagations are static: lower each for the MXU kernel
            from ..ops.pallas.segsum_mxu import (mxu_graph_from_coo,
                                                 propagate_mxu)
            g_adj = mxu_graph_from_coo(np.asarray(adj_src), np.asarray(adj_dst),
                                       np.asarray(adj_w), n,
                msg_dtype=mxu_msg_dtype(impl))
            g_r = mxu_graph_from_coo(np.asarray(r_src), np.asarray(r_dst),
                                     np.asarray(r_w), num_users,
                                     num_src_nodes=num_items,
                msg_dtype=mxu_msg_dtype(impl))
            g_img = mxu_graph_from_coo(np.asarray(img_c), np.asarray(img_r),
                                       np.asarray(img_v), num_items,
                msg_dtype=mxu_msg_dtype(impl))
            g_txt = mxu_graph_from_coo(np.asarray(txt_c), np.asarray(txt_r),
                                       np.asarray(txt_v), num_items,
                msg_dtype=mxu_msg_dtype(impl))

            def prop_adj(x):
                return propagate_mxu(g_adj, x)

            def prop_r(x):
                return propagate_mxu(g_r, x)

            def prop_img(x):
                return propagate_mxu(g_img, x)

            def prop_txt(x):
                return propagate_mxu(g_txt, x)
        else:
            def prop_adj(x):
                return jax.ops.segment_sum(x[adj_src] * adj_w[:, None],
                                           adj_dst, num_segments=n)

            def prop_r(x):
                return jax.ops.segment_sum(x[r_src] * r_w[:, None], r_dst,
                                           num_segments=num_users)

            def prop_img(x):
                return jax.ops.segment_sum(x[img_c] * img_v[:, None], img_r,
                                           num_segments=num_items)

            def prop_txt(x):
                return jax.ops.segment_sum(x[txt_c] * txt_v[:, None], txt_r,
                                           num_segments=num_items)

        def apply_lin(p, x, bias=True):
            out = x @ p["w"]
            return out + p["b"] if bias else out

        def forward(p):
            image_feats = apply_lin(p["image_trs"], p["v_feat"])
            text_feats = apply_lin(p["text_trs"], p["t_feat"])

            # Behavior-Guided Purifier
            img_item = p["item_emb"] * jax.nn.sigmoid(
                apply_lin(p["gate_v"], image_feats))
            txt_item = p["item_emb"] * jax.nn.sigmoid(
                apply_lin(p["gate_t"], text_feats))

            # User-Item view (LightGCN)
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            x = ego
            for _ in range(n_ui):
                x = prop_adj(x)
                layers.append(x)
            content = jnp.mean(jnp.stack(layers, axis=1), axis=1)

            # Item-Item views lifted to users by R
            for _ in range(n_mm):
                img_item = prop_img(img_item)
            img_user = prop_r(img_item)
            image_embeds = jnp.concatenate([img_user, img_item], axis=0)
            for _ in range(n_mm):
                txt_item = prop_txt(txt_item)
            txt_user = prop_r(txt_item)
            text_embeds = jnp.concatenate([txt_user, txt_item], axis=0)

            # Behavior-Aware Fuser
            def query(x):
                return apply_lin(p["query2"], jnp.tanh(
                    apply_lin(p["query1"], x)), bias=False)

            att = jnp.concatenate([query(image_embeds), query(text_embeds)],
                                  axis=-1)
            w_common = jax.nn.softmax(att, axis=-1)
            common = (w_common[:, 0:1] * image_embeds
                      + w_common[:, 1:2] * text_embeds)
            sep_img = image_embeds - common
            sep_txt = text_embeds - common
            img_prefer = jax.nn.sigmoid(apply_lin(p["gate_image_prefer"], content))
            txt_prefer = jax.nn.sigmoid(apply_lin(p["gate_text_prefer"], content))
            side = (img_prefer * sep_img + txt_prefer * sep_txt + common) / 3
            all_embeds = content + side
            return (all_embeds[:num_users], all_embeds[num_users:],
                    side, content)

        self._forward = forward

        def info_nce(v1, v2, temp, w_b):
            v1 = v1 / (jnp.linalg.norm(v1, axis=1, keepdims=True) + 1e-12)
            v2 = v2 / (jnp.linalg.norm(v2, axis=1, keepdims=True) + 1e-12)
            pos = jnp.exp(jnp.sum(v1 * v2, -1) / temp)
            # zero-weight padding rows (partial final batch) are excluded
            # from every row's denominator — the reference's exact partial
            # batches never contain them
            ttl = jnp.sum(jnp.exp(v1 @ v2.T / temp) * w_b[None, :], axis=1)
            n_valid = jnp.maximum(jnp.sum(w_b), 1.0)
            return jnp.sum(-jnp.log(pos / jnp.maximum(ttl, 1e-12)) * w_b) \
                / n_valid

        def loss_fn(p, batch):
            users, pos, neg, w_b = batch
            neg = neg[:, 0]
            u_all, i_all, side, content = forward(p)
            ue, pe, ne = u_all[users], i_all[pos], i_all[neg]
            y_pos = jnp.sum(ue * pe, -1)
            y_neg = jnp.sum(ue * ne, -1)
            n_valid = jnp.maximum(jnp.sum(w_b), 1.0)
            mf = -jnp.sum(jax.nn.log_sigmoid(y_pos - y_neg) * w_b) / n_valid
            reg = 0.5 * jnp.sum(jnp.sum(ue ** 2 + pe ** 2 + ne ** 2, -1) * w_b) \
                / n_valid
            side_u, side_i = side[:num_users], side[num_users:]
            cont_u, cont_i = content[:num_users], content[num_users:]
            cl = info_nce(side_i[pos], cont_i[pos], 0.2, w_b) \
                + info_nce(side_u[users], cont_u[users], 0.2, w_b)
            return mf + reg_w * reg + cl_w * cl

        self._finalize_setup_flat(run_config.seed, loss_fn)

        @jax.jit
        def embeddings_fn(p):
            u_all, i_all, _, _ = forward(p)
            return u_all, i_all

        self._embeddings_fn = embeddings_fn
        self._final = None

    def evaluate(self, test_users=None):
        self._final = self._embeddings_fn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final is None:
            self._final = self._embeddings_fn(self.params)
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        if self._final is None:
            self._final = self._embeddings_fn(self.params)
        return self._final
