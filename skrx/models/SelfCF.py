"""SelfCF — self-supervised collaborative filtering (BYOL-style, no negatives).

Paper: Zhou et al., "SelfCF: A Simple Framework for Self-supervised
Collaborative Filtering" (ACM TORS 2023).

Behavioral parity with reference skrec/recommender/SelfCF.py:23-291
(SELFCFED_LGN variant): LightGCN encoder with per-step random-rate edge
dropout (rate ~ U[0,1) each step, SelfCF.py:131-135), symmetric-normalized
adjacency with 1e-7 degree epsilon; BYOL head — target = element-dropout of
the detached online embeddings, linear predictor, negative-cosine loss both
directions (each /2) + reg*L2 on the online batch embeddings; Adam; predict
= u_on·i_tgt + u_tgt·i_on over the catalog.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import get_initializer, torch_layer_default
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import (build_prop_graph, ChunkedDotPredictMixin,
                     EpochTrainedRecommender, make_train_step)
from .pipeline import InteractionEpochPipeline

__all__ = ["SelfCF", "SelfCFConfig"]


class SelfCFConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 0.0
    embed_dim: int = 64
    n_layers: int = 2
    dropout: float = 0.5
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"n_layers": [2], "reg": [0.0], "dropout": [0.5]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_dim, int) and self.embed_dim > 0
        assert isinstance(self.n_layers, int) and self.n_layers > 0
        assert isinstance(self.dropout, float) and 0 <= self.dropout < 1
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS


def _norm_adj_eps(pairs: np.ndarray, num_users: int, num_items: int) -> sp.csr_matrix:
    """Symmetric normalization with the reference's 1e-7 degree epsilon
    (SelfCF.py:96-112)."""
    n = num_users + num_items
    ones = np.ones(len(pairs), dtype=np.float32)
    upper = sp.csr_matrix((ones, (pairs[:, 0], pairs[:, 1] + num_users)),
                          shape=(n, n))
    adj = (upper + upper.T).tocsr()
    deg = np.asarray((adj > 0).sum(axis=1)).flatten() + 1e-7
    d_inv = sp.diags(np.power(deg, -0.5))
    return (d_inv @ adj @ d_inv).tocsr()


class SelfCF(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = SelfCFConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items

        adj = _norm_adj_eps(self.dataset.train_data.to_user_item_pairs(),
                            self.num_users, self.num_items)
        graph = build_prop_graph(adj, cfg.graph_impl, mesh=self.mesh)

        init = get_initializer("xavier_uniform")
        keys = jax.random.split(jax.random.key(run_config.seed), 4)
        d = cfg.embed_dim
        # predictor stays at torch's default Linear init — the reference
        # never re-inits it (SelfCF.py:203); the nonzero bias measurably
        # speeds up the BYOL dynamic
        self.params = {
            "user_emb": init(keys[0], (self.num_users, d)),
            "item_emb": init(keys[1], (self.num_items, d)),
            "pred_w": torch_layer_default(keys[2], (d, d), d),
            "pred_b": torch_layer_default(keys[3], (d,), d),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = InteractionEpochPipeline(self.dataset.train_data,
                                                 cfg.batch_size, mesh=self.mesh)
        n_layers, dropout, reg = cfg.n_layers, cfg.dropout, cfg.reg
        num_users = self.num_users
        num_edges = adj.nnz

        def encode(p, edge_mask=None):
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            h = ego
            for _ in range(n_layers):
                h = propagate(graph, h, edge_mask)
                layers.append(h)
            combined = jnp.mean(jnp.stack(layers, axis=1), axis=1)
            return combined[:num_users], combined[num_users:]

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
            return jnp.sum(a * b, -1)

        def loss_fn(p, batch, key):
            users, pos, w = batch
            k_rate, k_edge, k_u, k_i = jax.random.split(key, 4)
            # per-step random edge-dropout rate ~ U[0,1)
            rate = jax.random.uniform(k_rate)
            keep = jax.random.uniform(k_edge, (num_edges,)) >= rate
            edge_mask = keep.astype(jnp.float32) / jnp.maximum(1.0 - rate, 1e-8)
            u_all, i_all = encode(p, edge_mask)
            u_on, i_on = u_all[users], i_all[pos]

            u_tgt = jax.lax.stop_gradient(u_on)
            i_tgt = jax.lax.stop_gradient(i_on)
            if dropout > 0:
                mask_u = jax.random.bernoulli(k_u, 1 - dropout, u_tgt.shape)
                u_tgt = jnp.where(mask_u, u_tgt / (1 - dropout), 0.0)
                mask_i = jax.random.bernoulli(k_i, 1 - dropout, i_tgt.shape)
                i_tgt = jnp.where(mask_i, i_tgt / (1 - dropout), 0.0)

            reg_term = 0.5 * jnp.sum((jnp.sum(u_on ** 2, -1)
                                      + jnp.sum(i_on ** 2, -1)) * w)
            u_pred = u_on @ p["pred_w"] + p["pred_b"]
            i_pred = i_on @ p["pred_w"] + p["pred_b"]
            n_valid = jnp.maximum(jnp.sum(w), 1.0)
            loss_ui = -jnp.sum(cos(u_pred, i_tgt) * w) / n_valid / 2
            loss_iu = -jnp.sum(cos(i_pred, u_tgt) * w) / n_valid / 2
            return loss_ui + loss_iu + reg * reg_term

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
            u_on, i_on = encode(p, None)
            u_pred = u_on @ p["pred_w"] + p["pred_b"]
            i_pred = i_on @ p["pred_w"] + p["pred_b"]
            return u_pred, u_on, i_pred, i_on

        self._embeddings_fn = embeddings_fn

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        # independent streams: the pipeline consumes k_epoch (shuffle /
        # negatives); the carry key drives in-step dropout — sharing one key
        # correlates batch-0 dropout with the sampling stream
        k_epoch, k_carry = jax.random.split(key)
        carry = (self.params, self.opt_state, k_carry)
        (self.params, self.opt_state, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._step_with_key)
        return float(loss)

    def evaluate(self, test_users=None):
        self._final = self._embeddings_fn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if getattr(self, "_final", None) is None:  # cached per evaluation
            self._final = self._embeddings_fn(self.params)
        u_pred, u_on, i_pred, i_on = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        # u_online·i_target + u_target·i_online (SelfCF.py:235-241)
        return u_pred[users] @ i_on.T + u_on[users] @ i_pred.T

    def _chunk_embeddings(self):
        # the two-dot predict is one concatenated dot (round 4):
        # uv = [u_pred | u_on], table = [i_on | i_pred]. Memoized on the
        # cached eval embeddings' identity (fresh concats per call would
        # defeat the serving packed-table cache, keyed by table id).
        if getattr(self, "_final", None) is None:
            self._final = self._embeddings_fn(self.params)
        cached = getattr(self, "_concat_cache", None)
        if cached is None or cached[0] is not self._final:
            u_pred, u_on, i_pred, i_on = self._final
            self._concat_cache = (self._final, (
                jnp.concatenate([u_pred, u_on], axis=1),
                jnp.concatenate([i_on, i_pred], axis=1)))
        return self._concat_cache[1]
