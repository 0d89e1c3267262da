"""LATTICE — learned latent item-item structure for multimodal rec.

Paper: Zhang et al., "Mining Latent Structures for Multimedia
Recommendation" (MM 2021).

Behavioral parity with reference skrec/recommender/LATTICE.py:24-354:
per-modality original kNN graphs from raw features (cosine top-k keeping the
similarity VALUES, row-normalized laplacian, disk-cached); per-epoch learned
graph rebuilt from the projected features on the FIRST batch of each epoch
(gradients flow through the modal-weight softmax and projectors there;
subsequent batches reuse the detached adjacency); blend
(1-lambda)*learned + lambda*original; n_layers dense item-graph propagation;
u-i branch lightgcn/ngcf/mf over the left-normalized (A+I) graph; item
output += L2-normalized h; mean BPR + reg*L2/batch; Adam.

The learned adjacency is a dense (N, N) matmul — MXU-friendly; catalogs
beyond ~100k items should prefer FREEDOM's frozen sparse graph.
"""
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer, torch_layer_default
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig, normalize_adj_matrix
from .common import (build_prop_graph, ChunkedDotPredictMixin,
                     EpochTrainedRecommender)
from .pipeline import PairwiseEpochPipeline

import scipy.sparse as sp

__all__ = ["LATTICE", "LATTICEConfig"]


class LATTICEConfig(ModelConfig):
    lr: float = 1e-4
    reg: float = 0.0
    embed_dim: int = 64
    feat_embed_dim: int = 64
    weight_size: Optional[List[int]] = None   # default [64, 64]
    lambda_coeff: float = 0.9
    mess_dropout: Optional[List[float]] = None  # default [0.1, 0.1]
    n_layers: int = 1
    knn_k: int = 10
    cf_model: str = "lightgcn"  # lightgcn | ngcf | mf
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"lr": [0.0001, 0.0005, 0.001, 0.005],
                "reg": [0.0, 1e-05, 1e-04, 1e-03]}

    def _validate(self):
        if self.weight_size is None:
            self.weight_size = [64, 64]
        if self.mess_dropout is None:
            self.mess_dropout = [0.1, 0.1]
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert self.cf_model in {"lightgcn", "ngcf", "mf"}
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _build_sim(feats):
    norm = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    return norm @ norm.T


def _knn_weighted(adj, k):
    vals, idx = jax.lax.top_k(adj, k)
    out = jnp.zeros_like(adj)
    rows = jnp.arange(adj.shape[0])[:, None]
    return out.at[rows, idx].set(vals)


def _norm_laplacian_dense(adj):
    rowsum = jnp.sum(adj, -1)
    d_inv_sqrt = jnp.where(rowsum > 0, rowsum ** -0.5, 0.0)
    return adj * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


class LATTICE(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = LATTICEConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users, num_items = self.num_users, self.num_items

        v_feat = self.dataset.img_features
        t_feat = self.dataset.txt_features
        has_v, has_t = v_feat is not None, t_feat is not None
        assert has_v or has_t, \
            "LATTICE requires at least one modality feature table"

        # left-normalized (A + I) u-i graph (LATTICE.py:172-195)
        pairs = self.dataset.train_data.to_user_item_pairs()
        n = num_users + num_items
        ones = np.ones(len(pairs), dtype=np.float32)
        upper = sp.csr_matrix((ones, (pairs[:, 0], pairs[:, 1] + num_users)),
                              shape=(n, n))
        adj = upper + upper.T + sp.eye(n)
        self._ui_graph = build_prop_graph(
            normalize_adj_matrix(adj, "left"), cfg.graph_impl,
            mesh=self.mesh)

        # original (frozen) modality adjacencies, disk-cached dense
        cache_dir = os.path.join(self.dataset.data_dir, "_data_cache")
        os.makedirs(cache_dir, exist_ok=True)

        def original_adj(feats, tag):
            path = os.path.join(cache_dir, f"{tag}_lattice_adj_{cfg.knn_k}.npy")
            if os.path.exists(path):
                return jnp.asarray(np.load(path))
            dense = _norm_laplacian_dense(_knn_weighted(
                _build_sim(jnp.asarray(feats.astype(np.float32))), cfg.knn_k))
            np.save(path, np.asarray(dense))
            return dense

        self._image_original = original_adj(v_feat, "image") if has_v else None
        self._text_original = original_adj(t_feat, "text") if has_t else None

        xavier = get_initializer("xavier_uniform")
        keys = jax.random.split(jax.random.key(run_config.seed), 8)
        d = cfg.embed_dim
        self.params = {
            "user_emb": xavier(keys[0], (num_users, d)),
            "item_emb": xavier(keys[1], (num_items, d)),
            "modal_weight": jnp.asarray([0.5, 0.5]),
        }
        # trs and ngcf Linears keep torch's default U(+-1/sqrt(fan_in))
        # weight and bias — the reference only xavier-inits the embedding
        # tables (LATTICE.py:118-119)
        def lin(key, d_in, d_out):
            kw, kb = jax.random.split(key)
            return {"w": torch_layer_default(kw, (d_in, d_out), d_in),
                    "b": torch_layer_default(kb, (d_out,), d_in)}

        if has_v:
            self.params["v_feat"] = jnp.asarray(v_feat.astype(np.float32))
            self.params["image_trs"] = lin(keys[2], v_feat.shape[1],
                                           cfg.feat_embed_dim)
        if has_t:
            self.params["t_feat"] = jnp.asarray(t_feat.astype(np.float32))
            self.params["text_trs"] = lin(keys[3], t_feat.shape[1],
                                          cfg.feat_embed_dim)
        if cfg.cf_model == "ngcf":
            sizes = [d] + list(cfg.weight_size)
            self.params["gc"] = [
                lin(jax.random.fold_in(keys[4], i), sizes[i], sizes[i + 1])
                for i in range(len(cfg.weight_size))]
            self.params["bi"] = [
                lin(jax.random.fold_in(keys[5], i), sizes[i], sizes[i + 1])
                for i in range(len(cfg.weight_size))]

        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=1, mesh=self.mesh)
        lam, n_layers, cf_model = cfg.lambda_coeff, cfg.n_layers, cfg.cf_model
        n_ui_layers = len(cfg.weight_size)
        mess_dropout = cfg.mess_dropout
        reg_w = cfg.reg
        ui_graph = self._ui_graph
        img_orig, txt_orig = self._image_original, self._text_original

        def build_item_adj(p):
            weight = jax.nn.softmax(p["modal_weight"])
            learned, original = None, None
            if has_v:
                feats = p["v_feat"] @ p["image_trs"]["w"] + p["image_trs"]["b"]
                img_adj = _knn_weighted(_build_sim(feats), cfg.knn_k)
                learned, original = img_adj, img_orig
            if has_t:
                feats = p["t_feat"] @ p["text_trs"]["w"] + p["text_trs"]["b"]
                txt_adj = _knn_weighted(_build_sim(feats), cfg.knn_k)
                learned, original = txt_adj, txt_orig
            if has_v and has_t:
                learned = weight[0] * img_adj + weight[1] * txt_adj
                original = weight[0] * img_orig + weight[1] * txt_orig
            learned = _norm_laplacian_dense(learned)
            return (1 - lam) * learned + lam * original

        def forward(p, item_adj, key=None):
            h = p["item_emb"]
            for _ in range(n_layers):
                h = item_adj @ h
            h_norm = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-12)

            if cf_model == "mf":
                return p["user_emb"], p["item_emb"] + h_norm

            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            x = ego
            for i in range(n_ui_layers):
                side = propagate(ui_graph, x)
                if cf_model == "ngcf":
                    s = jax.nn.leaky_relu(side @ p["gc"][i]["w"] + p["gc"][i]["b"])
                    b = jax.nn.leaky_relu((x * side) @ p["bi"][i]["w"]
                                          + p["bi"][i]["b"])
                    x = s + b
                    if key is not None and mess_dropout[i] > 0:
                        key, sub = jax.random.split(key)
                        keep = jax.random.bernoulli(sub, 1 - mess_dropout[i],
                                                    x.shape)
                        x = jnp.where(keep, x / (1 - mess_dropout[i]), 0.0)
                    x_norm = x / (jnp.linalg.norm(x, axis=-1, keepdims=True)
                                  + 1e-12)
                    layers.append(x_norm)
                else:  # lightgcn
                    x = side
                    layers.append(x)
            combined = jnp.mean(jnp.stack(layers, axis=1), axis=1)
            return combined[:num_users], combined[num_users:] + h_norm

        self._build_item_adj = jax.jit(build_item_adj)
        self._forward = forward

        def train_step(carry, batch):
            params, opt_state, item_adj, is_first, key = carry
            users, pos, neg, w_b = batch
            neg = neg[:, 0]
            key, sub = jax.random.split(key)

            def loss_fn(p):
                # first batch of the epoch: rebuild the learned graph with
                # gradient; later batches use the detached carry adjacency
                adj = jax.lax.cond(is_first, lambda pp: build_item_adj(pp),
                                   lambda pp: item_adj, p)
                u_all, i_all = forward(p, adj, sub)
                ue, pe, ne = u_all[users], i_all[pos], i_all[neg]
                y_pos = jnp.sum(ue * pe, -1)
                y_neg = jnp.sum(ue * ne, -1)
                n_valid = jnp.maximum(jnp.sum(w_b), 1.0)
                mf = -jnp.sum(jax.nn.log_sigmoid(y_pos - y_neg) * w_b) / n_valid
                reg = 0.5 * jnp.sum(jnp.sum(ue ** 2 + pe ** 2 + ne ** 2, -1)
                                    * w_b) / users.shape[0]
                return mf + reg_w * reg, adj

            (loss, new_adj), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_adj = jax.lax.stop_gradient(new_adj)
            return (params, opt_state, new_adj, jnp.asarray(False), key), loss

        self._step_full = train_step
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)
        self._final = None

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        # independent streams: the pipeline consumes k_epoch (shuffle /
        # negatives); the carry key drives in-step dropout. Sharing one key
        # would also alias a donated carry leaf with the non-donated epoch
        # key argument (f(a, donate(a)) — rejected by the runtime).
        k_epoch, k_carry = jax.random.split(key)
        item_adj = jnp.zeros((self.num_items, self.num_items), jnp.float32)
        carry = (self.params, self.opt_state, item_adj, jnp.asarray(True),
                 k_carry)
        (self.params, self.opt_state, _, _, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._step_full)
        return float(loss)

    def evaluate(self, test_users=None):
        adj = self._build_item_adj(self.params)
        self._final = self._forward(self.params, adj, None)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final is None:
            adj = self._build_item_adj(self.params)
            self._final = self._forward(self.params, adj, None)
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        # plain dot over the propagated embeddings (round 4)
        if self._final is None:
            adj = self._build_item_adj(self.params)
            self._final = self._forward(self.params, adj, None)
        return self._final
