"""TransRec — translation-based sequential recommendation.

Paper: He & McAuley, "Translation-based Recommendation" (RecSys 2017).

Behavioral parity with reference skrec/recommender/TransRec.py:23-157:
zero-init user embeddings + normal global transition vector + normal item
embeddings + zero item bias; score = -||u + T + e_last - e_i|| + b_i; summed
BPR + L2 reg, Adam; predict translates from each user's last training item.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import bpr_loss, euclidean_distance, get_initializer
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import CachedUserVecChunkMixin, EpochTrainedRecommender
from .pipeline import SequentialPairwiseEpochPipeline

__all__ = ["TransRec", "TransRecConfig"]


class TransRecConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-3
    embed_size: int = 64
    # "adam" (dense, reference parity) or "lazy_adam" (row-wise sparse
    # moments for the user/item tables; 'trans' stays dense)
    optimizer: str = "adam"
    batch_size: int = 1024
    epochs: int = 1000
    early_stop: int = 200

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert self.optimizer in ("adam", "lazy_adam")
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert isinstance(self.epochs, int) and self.epochs >= 0
        assert isinstance(self.early_stop, int)


class TransRec(CachedUserVecChunkMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = TransRecConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        self.user_pos_dict = self.dataset.train_data.to_user_dict_by_time()

        init = get_initializer("normal")
        keys = jax.random.split(jax.random.key(run_config.seed), 2)
        d = cfg.embed_size
        self.params = {
            "user_emb": jnp.zeros((self.num_users, d), jnp.float32),
            "item_emb": init(keys[0], (self.num_items, d)),
            "trans": init(keys[1], (1, d)),
            "item_bias": jnp.zeros((self.num_items,), jnp.float32),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = SequentialPairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size, num_previous=1, num_next=1, mesh=self.mesh)
        reg = cfg.reg

        def loss_fn(p, batch):
            users, pos, neg, w, prev = batch
            neg = neg[:, 0]
            last = prev[:, 0]
            translated = p["user_emb"][users] + p["trans"] + p["item_emb"][last]
            y_pos = -euclidean_distance(translated, p["item_emb"][pos]) \
                + p["item_bias"][pos]
            y_neg = -euclidean_distance(translated, p["item_emb"][neg]) \
                + p["item_bias"][neg]
            loss = jnp.sum(bpr_loss(y_pos, y_neg) * w)
            reg_term = 0.5 * (jnp.sum(jnp.sum(
                p["user_emb"][users] ** 2 + p["item_emb"][last] ** 2
                + p["item_emb"][pos] ** 2 + p["item_emb"][neg] ** 2, -1) * w)
                + jnp.sum(p["trans"] ** 2)
                + jnp.sum((p["item_bias"][pos] ** 2 + p["item_bias"][neg] ** 2) * w))
            return loss + reg * reg_term

        if cfg.optimizer == "lazy_adam":
            from ..ops.optim import make_lazy_train_step

            def gathered_loss(gathered, dense, batch):
                users, pos, neg, w, prev = batch
                ue, ie_l, ie_p, ie_n, b_p, b_n = gathered
                translated = ue + dense["trans"] + ie_l
                y_pos = -euclidean_distance(translated, ie_p) + b_p
                y_neg = -euclidean_distance(translated, ie_n) + b_n
                loss = jnp.sum(bpr_loss(y_pos, y_neg) * w)
                reg_term = 0.5 * (jnp.sum(jnp.sum(
                    ue ** 2 + ie_l ** 2 + ie_p ** 2 + ie_n ** 2, -1) * w)
                    + jnp.sum(dense["trans"] ** 2)
                    + jnp.sum((b_p ** 2 + b_n ** 2) * w))
                return loss + reg * reg_term

            gathers = [("user_emb", lambda b: b[0]),
                       ("item_emb", lambda b: b[4][:, 0]),
                       ("item_emb", lambda b: b[1]),
                       ("item_emb", lambda b: b[2][:, 0]),
                       ("item_bias", lambda b: b[1]),
                       ("item_bias", lambda b: b[2][:, 0])]
            self._train_step, self.opt_state = make_lazy_train_step(
                cfg.lr, gathers, gathered_loss, self.params)
            self._rng = jax.random.key(run_config.seed + 1)
        else:
            self._finalize_setup_flat(run_config.seed, loss_fn)

        last_items = np.zeros(self.num_users, dtype=np.int32)
        for u, seq in self.user_pos_dict.items():
            last_items[u] = seq[-1]
        self._last_items = jnp.asarray(last_items)

        score = TransRec._topk_score_fn

        @jax.jit
        def predict_fn(p, users):
            translated = (p["user_emb"][users] + p["trans"]
                          + p["item_emb"][self._last_items[users]])
            # -||t - e_i|| for the whole catalog, via the SAME expanded
            # form every other eval path uses — one formulation everywhere
            # so full/chunked/TP rankings agree on near-ties (advisor r4)
            return score(translated, p["item_emb"], p["item_bias"])

        self._predict_fn = predict_fn

    # TP eval (round 4): translation score is -||t - e_i|| + b_i — not a
    # dot; predict_topk routes the expanded-euclidean _topk_score_fn
    # through the catalog shards (SGAT/CML pattern).
    def _user_vectors(self, users):
        p = self.params
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return (p["user_emb"][users] + p["trans"]
                + p["item_emb"][self._last_items[users]])

    def _topk_factors(self, uv):
        return uv, self.params["item_emb"], self.params["item_bias"]

    @staticmethod
    def _topk_score_fn(uv, items, bias):
        d2 = (jnp.sum(uv * uv, -1)[:, None] - 2.0 * (uv @ items.T)
              + jnp.sum(items * items, -1)[None, :])
        return -jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12) + bias[None, :]

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        p = self.params
        return self._topk_score_fn(uv, p["item_emb"][item_lo:item_hi],
                                   p["item_bias"][item_lo:item_hi])

