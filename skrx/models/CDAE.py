"""CDAE — Collaborative Denoising Autoencoder.

Paper: Wu et al., "Collaborative Denoising Auto-Encoders for Top-N
Recommender Systems" (WSDM 2016).

Behavioral parity with reference skrec/recommender/CDAE.py:25-226: encoder =
act(dropout(x) @ E + u + offset) over the user's interaction vector
(with the sampled negatives also set to 1 in the input, CDAE.py:173-178);
decoder scores via a second item table + bias; loss (sigmoid-CE or square)
summed over the positive + sampled-negative positions only; L2 reg over the
unique batch items' rows; Adam.

TPU re-design: the variable-length per-user pos/neg index lists become dense
(B, N) masks — negatives are sampled on device with per-user exclusion and
scattered into an indicator matrix (scatter-set collapses duplicates, exactly
reproducing the reference's ``np.unique``), so the whole epoch is one jitted
`lax.scan` with static shapes.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer, sigmoid_cross_entropy, square_loss
from ..ops.sampling import sample_negatives
from ..run_config import RunConfig
from ..utils import ModelConfig
from .base import JaxRecommender
from .common import CachedUserVecChunkMixin
from .pipeline import UserVecEpochPipeline

__all__ = ["CDAE", "CDAEConfig"]


class CDAEConfig(ModelConfig):
    lr: float = 0.001
    reg: float = 0.001
    hidden_dim: int = 64
    dropout: float = 0.5
    num_neg: int = 5
    hidden_act: str = "sigmoid"       # identity | sigmoid
    loss_func: str = "sigmoid_cross_entropy"  # sigmoid_cross_entropy | square
    batch_size: int = 256
    epochs: int = 1000
    early_stop: int = 200

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.hidden_dim, int) and self.hidden_dim > 0
        assert isinstance(self.dropout, float) and self.dropout < 1.0
        assert isinstance(self.num_neg, int) and self.num_neg >= 0
        assert self.hidden_act in {"identity", "sigmoid"}
        assert self.loss_func in {"sigmoid_cross_entropy", "square"}
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert isinstance(self.epochs, int) and self.epochs >= 0
        assert isinstance(self.early_stop, int)


class CDAE(CachedUserVecChunkMixin, JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = CDAEConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items

        init = get_initializer("normal")
        keys = jax.random.split(jax.random.key(run_config.seed), 3)
        d = cfg.hidden_dim
        self.params = {
            "en_emb": init(keys[0], (self.num_items, d)),
            "en_offset": jnp.zeros((d,), jnp.float32),
            "de_emb": init(keys[1], (self.num_items, d)),
            "de_bias": jnp.zeros((self.num_items,), jnp.float32),
            "user_emb": init(keys[2], (self.num_users, d)),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.opt_state = self.optimizer.init(self.params)
        self.pipeline = UserVecEpochPipeline(self.dataset.train_data,
                                             cfg.batch_size, mesh=self.mesh)
        self._rng = jax.random.key(run_config.seed + 1)

        pp = self.dataset.train_data.to_padded_positive_table()
        pos_table = jnp.asarray(pp.table)
        pos_lengths = jnp.asarray(pp.lengths)
        # per-user negative slots: n_pos * num_neg, padded to the batch max
        max_k = max(int(pp.lengths.max()) * cfg.num_neg, 1)

        act = (lambda h: jax.nn.sigmoid(h)) if cfg.hidden_act == "sigmoid" \
            else (lambda h: h)
        loss_elem = sigmoid_cross_entropy \
            if cfg.loss_func == "sigmoid_cross_entropy" else square_loss
        dropout, reg, num_neg, num_items = (cfg.dropout, cfg.reg, cfg.num_neg,
                                            self.num_items)

        def encode(p, x, key, training):
            if training and dropout > 0.0:
                keep = 1.0 - dropout
                mask = jax.random.bernoulli(key, keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
            hidden = x @ p["en_emb"] + p["en_offset"][None, :]
            return hidden  # caller adds user emb then activates

        def loss_fn(p, batch):
            users, rows, w, key = batch
            k_neg, k_drop = jax.random.split(key)
            b = users.shape[0]
            # sample negatives: (B, max_k) with per-user exclusion; slots
            # beyond n_pos*num_neg are invalidated
            neg = sample_negatives(k_neg, users, pos_table, num_items,
                                   num_neg=max_k, num_trials=4)
            slot_valid = (jnp.arange(max_k)[None, :]
                          < (pos_lengths[users] * num_neg)[:, None])
            neg = jnp.where(slot_valid, neg, num_items)  # pad id drops in scatter
            neg_mask = jnp.zeros((b, num_items + 1), rows.dtype) \
                .at[jnp.arange(b)[:, None], neg].set(1.0)[:, :num_items]
            x_in = jnp.maximum(rows, neg_mask)  # negatives set to 1 (CDAE quirk)

            hidden = encode(p, x_in, k_drop, training=True)
            hidden = act(hidden + p["user_emb"][users])
            logits = hidden @ p["de_emb"].T + p["de_bias"][None, :]

            union = jnp.maximum(rows, neg_mask) * w[:, None]
            loss = jnp.sum(loss_elem(logits, rows) * union)

            item_mask = (jnp.max(union, axis=0) > 0).astype(jnp.float32)
            reg_term = 0.5 * (
                jnp.sum(jnp.sum(p["en_emb"] ** 2, -1) * item_mask)
                + jnp.sum(p["en_offset"] ** 2)
                + jnp.sum(jnp.sum(p["user_emb"][users] ** 2, -1) * w)
                + jnp.sum(jnp.sum(p["de_emb"] ** 2, -1) * item_mask)
                + jnp.sum(p["de_bias"] ** 2 * item_mask))
            return loss + reg * reg_term

        def train_step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        self._train_step = train_step

        @jax.jit
        def predict_fn(p, rows, users):
            hidden = act(rows @ p["en_emb"] + p["en_offset"][None, :]
                         + p["user_emb"][users])
            return hidden @ p["de_emb"].T + p["de_bias"][None, :]

        self._predict_fn = predict_fn

        # tower contract (CachedUserVecChunkMixin): the decoder is a plain
        # dot over de_emb, so CDAE joins the fused/paged + tensor-parallel
        # evaluation families (round 4) — predict == uv @ de_emb.T + bias
        @jax.jit
        def uv_fn(p, rows, users):
            return act(rows @ p["en_emb"] + p["en_offset"][None, :]
                       + p["user_emb"][users])

        self._uv_fn = uv_fn

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        (self.params, self.opt_state), loss = self.pipeline.run_epoch(
            key, (self.params, self.opt_state), self._train_step)
        return float(loss)

    def predict(self, users) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        rows = self.pipeline.rows_for(users)
        return self._predict_fn(self.params, rows, users)

    def _user_vectors(self, users):
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        rows = self.pipeline.rows_for(users)
        return self._uv_fn(self.params, rows, users)

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        p = self.params
        return uv @ p["de_emb"][item_lo:item_hi].T \
            + p["de_bias"][None, item_lo:item_hi]

    def _topk_factors(self, uv):
        return uv, self.params["de_emb"], self.params["de_bias"]
