"""HGN — hierarchical gating networks for sequential recommendation.

Paper: Ma et al., "Hierarchical Gating Networks for Sequential
Recommendation" (KDD 2019).

Behavioral parity with reference skrec/recommender/HGN.py:25-230: feature
gate (sigmoid of item-linear + user-linear), instance gate (sigmoid of
gated-item·w + user·W with per-position columns), instance-weighted mean;
score = user·w2 + union·w2 + sum_l item_l·w2 + b2; summed BPR over seq_T
positions; Adam with weight_decay=reg; pad index = num_items with
zero-frozen pad rows.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import bpr_loss, get_initializer
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import (CachedUserVecChunkMixin, EpochTrainedRecommender,
                     adam_l2)
from .pipeline import SequentialPairwiseEpochPipeline

__all__ = ["HGN", "HGNConfig"]


class HGNConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-3
    seq_L: int = 5
    seq_T: int = 3
    embed_size: int = 64
    # "adam" (dense adam_l2, reference parity) or "lazy_adam" (row-wise
    # sparse moments; weight decay applies to touched rows only —
    # SparseAdam-style deviation, skrx/ops/optim.py)
    optimizer: str = "adam"
    batch_size: int = 1024
    epochs: int = 1000
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert self.optimizer in ("adam", "lazy_adam")
        assert isinstance(self.seq_L, int) and self.seq_L > 0
        assert isinstance(self.seq_T, int) and self.seq_T > 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class HGN(CachedUserVecChunkMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = HGNConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        self.pad_idx = self.dataset.num_items
        n_items_pad = self.dataset.num_items + 1
        # predict exposes the zero-scored pad column (reference parity:
        # skrec HGN scores the full W2 incl. the zero-frozen pad row), so
        # the evaluator's catalog width is N+1
        self._eval_width = n_items_pad

        init = get_initializer("normal")
        he = get_initializer("he_uniform")
        xavier = get_initializer("xavier_uniform")
        keys = jax.random.split(jax.random.key(run_config.seed), 8)
        d, L = cfg.embed_size, cfg.seq_L
        self.params = {
            "user_emb": init(keys[0], (self.num_users, d)),
            "item_emb": init(keys[1], (n_items_pad, d)),
            "fg_item_w": he(keys[2], (d, d)), "fg_item_b": jnp.zeros((d,)),
            "fg_user_w": he(keys[3], (d, d)), "fg_user_b": jnp.zeros((d,)),
            "ig_item": xavier(keys[4], (d, 1)),
            "ig_user": xavier(keys[5], (d, L)),
            "W2": init(keys[6], (n_items_pad, d)),
            "b2": jnp.zeros((n_items_pad,)),
        }
        self.optimizer = adam_l2(cfg.lr, cfg.reg)
        self.pipeline = SequentialPairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size, num_previous=L,
            num_next=cfg.seq_T, pad=self.pad_idx, mesh=self.mesh)
        pad_idx, seq_T = self.pad_idx, cfg.seq_T

        def pad_masked(table):
            return table.at[pad_idx].set(0.0)

        def forward_user(p, users, seqs):
            item_embs = pad_masked(p["item_emb"])[seqs]       # (B, L, D)
            user_emb = p["user_emb"][users]                   # (B, D)
            gate = jax.nn.sigmoid(
                item_embs @ p["fg_item_w"] + p["fg_item_b"]
                + (user_emb @ p["fg_user_w"] + p["fg_user_b"])[:, None, :])
            gated = item_embs * gate                          # (B, L, D)
            term1 = (gated @ p["ig_item"])[..., 0]            # (B, L)
            term2 = user_emb @ p["ig_user"]                   # (B, L)
            inst = jax.nn.sigmoid(term1 + term2)
            union = jnp.sum(gated * inst[..., None], axis=1) \
                / jnp.sum(inst, axis=1, keepdims=True)
            return user_emb, item_embs, union

        def score_items(p, user_emb, item_embs, union, items):
            W2 = pad_masked(p["W2"])
            b2 = p["b2"].at[pad_idx].set(0.0)
            w2 = W2[items]                                    # (B, T, D)
            res = jnp.einsum("btd,bd->bt", w2, user_emb) + b2[items]
            res += jnp.einsum("btd,bd->bt", w2, union)
            res += jnp.einsum("bld,btd->bt", item_embs, w2)
            return res

        def loss_fn(p, batch):
            users, pos, neg, w, seqs = batch
            user_emb, item_embs, union = forward_user(p, users, seqs)
            items = jnp.concatenate([pos, neg], axis=1)
            scores = score_items(p, user_emb, item_embs, union, items)
            y_pos, y_neg = scores[:, :seq_T], scores[:, seq_T:]
            return jnp.sum(jnp.sum(bpr_loss(y_pos, y_neg), axis=1) * w)

        if cfg.optimizer == "lazy_adam":
            from ..ops.optim import make_lazy_train_step
            L_, T_ = L, seq_T

            def gathered_loss(gathered, dense, batch):
                users, pos, neg, w, seqs = batch
                ue, item_g, w2_g, b2_g = gathered
                b = users.shape[0]
                items = jnp.concatenate([pos, neg], axis=1)     # (B, 2T)
                item_embs = jnp.where((seqs == pad_idx)[..., None], 0.0,
                                      item_g.reshape(b, L_, -1))
                w2 = jnp.where((items == pad_idx)[..., None], 0.0,
                               w2_g.reshape(b, 2 * T_, -1))
                b2 = jnp.where(items == pad_idx, 0.0,
                               b2_g.reshape(b, 2 * T_))
                gate = jax.nn.sigmoid(
                    item_embs @ dense["fg_item_w"] + dense["fg_item_b"]
                    + (ue @ dense["fg_user_w"]
                       + dense["fg_user_b"])[:, None, :])
                gated = item_embs * gate
                term1 = (gated @ dense["ig_item"])[..., 0]
                term2 = ue @ dense["ig_user"]
                inst = jax.nn.sigmoid(term1 + term2)
                union = jnp.sum(gated * inst[..., None], axis=1) \
                    / jnp.sum(inst, axis=1, keepdims=True)
                res = jnp.einsum("btd,bd->bt", w2, ue) + b2
                res += jnp.einsum("btd,bd->bt", w2, union)
                res += jnp.einsum("bld,btd->bt", item_embs, w2)
                y_pos, y_neg = res[:, :T_], res[:, T_:]
                return jnp.sum(jnp.sum(bpr_loss(y_pos, y_neg), axis=1) * w)

            def item_rows(b):
                return jnp.concatenate([b[1], b[2]], axis=1).reshape(-1)

            gathers = [("user_emb", lambda b: b[0]),
                       ("item_emb", lambda b: b[4].reshape(-1)),
                       ("W2", item_rows),
                       ("b2", item_rows)]
            self._train_step, self.opt_state = make_lazy_train_step(
                cfg.lr, gathers, gathered_loss, self.params,
                weight_decay=cfg.reg)
            self._rng = jax.random.key(run_config.seed + 1)
        else:
            def train_step(carry, batch):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, batch)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            self._train_step = train_step
            self._finalize_setup(run_config.seed)

        seq_table, _ = self.dataset.train_data.to_padded_seq_tensor(
            L, pad_value=self.pad_idx)
        self._seq_table = jnp.asarray(seq_table)

        @jax.jit
        def user_vec_fn(p, users):
            # all three predict terms are dots against W2 rows, so they fold
            # into ONE user vector: user_emb + union + sum_l item_embs
            seqs = self._seq_table[users]
            user_emb, item_embs, union = forward_user(p, users, seqs)
            return user_emb + union + jnp.sum(item_embs, axis=1)

        @jax.jit
        def predict_fn(p, users):
            uv = user_vec_fn(p, users)
            W2 = pad_masked(p["W2"])
            b2 = p["b2"].at[pad_idx].set(0.0)
            return uv @ W2.T + b2[None, :]

        from functools import partial

        @partial(jax.jit, static_argnames=("width",))
        def score_chunk_fn(p, uv, lo, *, width):
            w2 = jax.lax.dynamic_slice_in_dim(p["W2"], lo, width)
            b2 = jax.lax.dynamic_slice_in_dim(p["b2"], lo, width)
            # replicate predict's pad_masked: zero the pad row if the chunk
            # covers it (full predict exposes the pad column with score 0)
            live = (lo + jnp.arange(width)) != pad_idx
            return (uv @ w2.T + b2[None, :]) * live[None, :]

        self._predict_fn = predict_fn
        self._user_vec_fn = user_vec_fn
        self._score_chunk_fn = score_chunk_fn

    def _user_vectors(self, users):
        return self._user_vec_fn(self.params, users)

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        return self._score_chunk_fn(self.params, uv, item_lo,
                                    width=item_hi - item_lo)

    def _topk_factors(self, uv):
        # predict == uv @ W2.T + b2 with the pad row zero-frozen (its column
        # scores exactly 0, same as full predict); width = N+1
        pad = self.pad_idx
        return (uv, self.params["W2"].at[pad].set(0.0),
                self.params["b2"].at[pad].set(0.0))
