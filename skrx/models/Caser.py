"""Caser — convolutional sequence embedding recommendation.

Paper: Tang & Wang, "Personalized Top-N Sequential Recommendation via
Convolutional Sequence Embedding" (WSDM 2018).

Behavioral parity with reference skrec/recommender/Caser.py:26-227:
horizontal convs of heights 1..L (nh filters each, relu + max-pool over
positions) + vertical conv (nv filters over the L axis), fc1+relu, concat
user embedding; per-item W2/b2 scoring; sigmoid-CE on seq_T positives vs
seq_T negatives (mean); Adam with weight_decay=l2_reg; pad index = num_items
with zero-frozen pad rows (padding_idx semantics emulated by masking the pad
row in every lookup, which also zeroes its gradient).
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer, sigmoid_cross_entropy, torch_layer_default
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import (CachedUserVecChunkMixin, EpochTrainedRecommender,
                     adam_l2, make_train_step)
from .pipeline import SequentialPairwiseEpochPipeline

__all__ = ["Caser", "CaserConfig"]


class CaserConfig(ModelConfig):
    lr: float = 1e-3
    l2_reg: float = 1e-6
    embed_size: int = 64
    seq_L: int = 5
    seq_T: int = 3
    nv: int = 4
    nh: int = 16
    dropout: float = 0.5
    # "adam" (dense adam_l2, reference parity) or "lazy_adam" (row-wise
    # sparse moments for the embedding/W2 tables; conv/FC leaves stay
    # dense; weight decay on touched rows only — skrx/ops/optim.py)
    optimizer: str = "adam"
    batch_size: int = 1024
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.l2_reg, float) and self.l2_reg >= 0
        assert self.optimizer in ("adam", "lazy_adam")
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert isinstance(self.seq_L, int) and self.seq_L > 0
        assert isinstance(self.seq_T, int) and self.seq_T > 0
        assert isinstance(self.nv, int) and self.nv > 0
        assert isinstance(self.nh, int) and self.nh > 0
        assert isinstance(self.dropout, float)
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class Caser(CachedUserVecChunkMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = CaserConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        self.pad_idx = self.dataset.num_items
        n_items_pad = self.dataset.num_items + 1  # +1 pad row
        # predict exposes the zero-scored pad column (reference parity:
        # skrec Caser scores the full W2 incl. the zero-frozen pad row), so
        # the evaluator's catalog width is N+1
        self._eval_width = n_items_pad

        init = get_initializer("normal")
        d, L = cfg.embed_size, cfg.seq_L
        keys = jax.random.split(jax.random.key(run_config.seed), 7 + 2 * L)
        fc1_in = cfg.nv * d + cfg.nh * L
        # conv/fc towers stay at torch's default layer init: the reference's
        # reset_parameters only re-inits the embedding tables (Caser.py:104-115)
        self.params = {
            "user_emb": init(keys[0], (self.num_users, d)),
            "item_emb": init(keys[1], (n_items_pad, d)),
            # (h, w=1, out); conv fan_in = in_ch * kh * kw = L
            "conv_v": torch_layer_default(keys[2], (L, 1, cfg.nv), L),
            "conv_v_b": torch_layer_default(keys[3], (cfg.nv,), L),
            "conv_h": [torch_layer_default(keys[7 + i], (i + 1, d, cfg.nh),
                                           (i + 1) * d) for i in range(L)],
            "conv_h_b": [torch_layer_default(keys[7 + L + i], (cfg.nh,),
                                             (i + 1) * d) for i in range(L)],
            "fc1_w": torch_layer_default(keys[4], (fc1_in, d), fc1_in),
            "fc1_b": torch_layer_default(keys[5], (d,), fc1_in),
            "W2": init(keys[6], (n_items_pad, 2 * d)),
            "b2": jnp.zeros((n_items_pad,)),
        }
        self.optimizer = adam_l2(cfg.lr, cfg.l2_reg)
        self.pipeline = SequentialPairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size, num_previous=L,
            num_next=cfg.seq_T, pad=self.pad_idx, mesh=self.mesh)

        pad_idx, dropout, seq_T = self.pad_idx, cfg.dropout, cfg.seq_T
        nv, nh = cfg.nv, cfg.nh

        def pad_masked(table):
            return table.at[pad_idx].set(0.0)  # padding_idx: frozen zero row

        def forward_user(p, users, seqs, key=None):
            item_embs = pad_masked(p["item_emb"])[seqs]   # (B, L, D)
            user_emb = p["user_emb"][users]               # (B, D)

            # vertical conv: (L,1) kernel over the L axis -> (B, nv, D)
            out_v = jnp.einsum("bld,lkv->bvd", item_embs,
                               p["conv_v"]) + p["conv_v_b"][None, :, None]
            out_v = out_v.reshape(users.shape[0], nv * item_embs.shape[-1])

            # horizontal convs of heights 1..L, full width, relu + max-pool
            outs = []
            for i in range(L):
                k = p["conv_h"][i]                        # (i+1, D, nh)
                h = i + 1
                windows = jnp.stack([item_embs[:, j: j + h, :]
                                     for j in range(L - h + 1)], axis=1)
                conv = jnp.einsum("bwhd,hdn->bwn", windows, k) \
                    + p["conv_h_b"][i]
                conv = jax.nn.relu(conv)
                outs.append(jnp.max(conv, axis=1))        # (B, nh)
            out_h = jnp.concatenate(outs, axis=1)         # (B, nh*L)

            out = jnp.concatenate([out_v, out_h], axis=1)
            if key is not None and dropout > 0:
                keep = jax.random.bernoulli(key, 1 - dropout, out.shape)
                out = jnp.where(keep, out / (1 - dropout), 0.0)
            z = jax.nn.relu(out @ p["fc1_w"] + p["fc1_b"])
            return jnp.concatenate([z, user_emb], axis=1)  # (B, 2D)

        self._forward_user = forward_user

        def train_step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(p):
                users, pos, neg, w, seqs = batch   # pos/neg: (B, seq_T)
                x = forward_user(p, users, seqs, sub)          # (B, 2D)
                W2 = pad_masked(p["W2"])
                b2 = p["b2"].at[pad_idx].set(0.0)
                items = jnp.concatenate([pos, neg], axis=1)    # (B, 2T)
                w2 = W2[items]                                 # (B, 2T, 2D)
                scores = jnp.einsum("btd,bd->bt", w2, x) + b2[items]
                y_pos, y_neg = scores[:, :seq_T], scores[:, seq_T:]
                loss = (sigmoid_cross_entropy(y_pos, jnp.ones_like(y_pos))
                        + sigmoid_cross_entropy(y_neg, jnp.zeros_like(y_neg)))
                return jnp.sum(jnp.mean(loss, axis=1) * w) / jnp.maximum(
                    jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        if cfg.optimizer == "lazy_adam":
            from ..ops.optim import make_lazy_train_step
            T_ = seq_T

            def gathered_loss(gathered, dense, batch, key):
                users, pos, neg, w, seqs = batch
                ue, item_g, w2_g, b2_g = gathered
                b = users.shape[0]
                items = jnp.concatenate([pos, neg], axis=1)     # (B, 2T)
                item_embs = jnp.where((seqs == pad_idx)[..., None], 0.0,
                                      item_g.reshape(b, L, -1))
                w2 = jnp.where((items == pad_idx)[..., None], 0.0,
                               w2_g.reshape(b, 2 * T_, -1))
                b2 = jnp.where(items == pad_idx, 0.0,
                               b2_g.reshape(b, 2 * T_))
                out_v = jnp.einsum("bld,lkv->bvd", item_embs,
                                   dense["conv_v"]) \
                    + dense["conv_v_b"][None, :, None]
                out_v = out_v.reshape(b, nv * item_embs.shape[-1])
                outs = []
                for i in range(L):
                    k = dense["conv_h"][i]
                    h = i + 1
                    windows = jnp.stack([item_embs[:, j: j + h, :]
                                         for j in range(L - h + 1)], axis=1)
                    conv = jnp.einsum("bwhd,hdn->bwn", windows, k) \
                        + dense["conv_h_b"][i]
                    outs.append(jnp.max(jax.nn.relu(conv), axis=1))
                out = jnp.concatenate([out_v] + outs, axis=1)
                if dropout > 0:
                    keep = jax.random.bernoulli(key, 1 - dropout, out.shape)
                    out = jnp.where(keep, out / (1 - dropout), 0.0)
                z = jax.nn.relu(out @ dense["fc1_w"] + dense["fc1_b"])
                x = jnp.concatenate([z, ue], axis=1)
                scores = jnp.einsum("btd,bd->bt", w2, x) + b2
                y_pos, y_neg = scores[:, :T_], scores[:, T_:]
                loss = (sigmoid_cross_entropy(y_pos, jnp.ones_like(y_pos))
                        + sigmoid_cross_entropy(y_neg,
                                                jnp.zeros_like(y_neg)))
                return jnp.sum(jnp.mean(loss, axis=1) * w) / jnp.maximum(
                    jnp.sum(w), 1.0)

            def item_rows(b):
                return jnp.concatenate([b[1], b[2]], axis=1).reshape(-1)

            gathers = [("user_emb", lambda b: b[0]),
                       ("item_emb", lambda b: b[4].reshape(-1)),
                       ("W2", item_rows),
                       ("b2", item_rows)]
            self._step_with_key, self.opt_state = make_lazy_train_step(
                cfg.lr, gathers, gathered_loss, self.params,
                weight_decay=cfg.l2_reg, with_key=True)
        else:
            self._step_with_key = train_step
            self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)

        seq_table, _ = self.dataset.train_data.to_padded_seq_tensor(
            L, pad_value=self.pad_idx)
        self._seq_table = jnp.asarray(seq_table)

        @jax.jit
        def user_vec_fn(p, users):
            seqs = self._seq_table[users]
            return forward_user(p, users, seqs, None)

        @jax.jit
        def predict_fn(p, users):
            x = user_vec_fn(p, users)
            W2 = pad_masked(p["W2"])
            b2 = p["b2"].at[pad_idx].set(0.0)
            return x @ W2.T + b2[None, :]

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
