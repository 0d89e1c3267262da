"""CML — collaborative metric learning.

Paper: Hsieh et al., "Collaborative Metric Learning" (WWW 2017).

Behavioral parity with reference skrec/recommender/CML.py:24-183: normal
(1/sqrt(d)) init; dns negative candidates per positive; hinge loss on the
minimum-distance impostor with WARP-style rank weight log(rank+1) where rank
= mean(impostors)*num_items; covariance (Frobenius, zero diagonal)
regularizer over user rows and pos+chosen-neg item rows; Adagrad; after each
step the touched user/item rows are clipped to clip_norm (the reference's
post-update scatter clip); predict = negative Euclidean distance to all
items.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import CachedUserVecChunkMixin, EpochTrainedRecommender
from .pipeline import PairwiseEpochPipeline

__all__ = ["CML", "CMLConfig"]


class CMLConfig(ModelConfig):
    lr: float = 0.05
    reg: float = 10.0
    embed_size: int = 64
    margin: float = 0.5
    clip_norm: float = 1.0
    dns: int = 10
    batch_size: int = 256
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, (float, int)) and self.reg >= 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert isinstance(self.margin, float) and self.margin >= 0
        assert isinstance(self.clip_norm, float) and self.clip_norm >= 0
        assert isinstance(self.dns, int) and self.dns > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _clip_rows_by_norm(table, rows, clip_norm):
    vecs = table[rows]
    norms = jnp.linalg.norm(vecs, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norms, 1e-12))
    return table.at[rows].set(vecs * scale)


class CML(CachedUserVecChunkMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = CMLConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_items = self.num_items

        std = 1.0 / (cfg.embed_size ** 0.5)
        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {
            "user_emb": std * jax.random.normal(k_u, (self.num_users, cfg.embed_size)),
            "item_emb": std * jax.random.normal(k_i, (self.num_items, cfg.embed_size)),
        }
        self.optimizer = optax.adagrad(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(self.dataset.train_data,
                                              cfg.batch_size, num_neg=cfg.dns, mesh=self.mesh)
        margin, reg, clip_norm, d = (cfg.margin, cfg.reg, cfg.clip_norm,
                                     cfg.embed_size)

        def cov_loss(matrix, w):
            # weighted moments: zero-weight padding rows (duplicates of one
            # epoch example) must not skew the covariance — the reference
            # computes it over the real (possibly short) batch only
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(matrix * w[:, None], axis=0) / n
            centered = (matrix - mean) * w[:, None]
            cov = centered.T @ centered / n
            cov = cov - jnp.diag(jnp.diagonal(cov))
            return jnp.sqrt(jnp.sum(jnp.square(cov)) + 1e-12)

        def loss_fn(p, batch):
            users, pos, neg, w = batch  # neg: (B, dns)
            ue = p["user_emb"][users]
            pe = p["item_emb"][pos]
            ne = p["item_emb"][neg]                      # (B, L, D)
            d_ui = jnp.sqrt(jnp.sum((ue - pe) ** 2, -1) + 1e-12)
            d_ujs = jnp.sqrt(jnp.sum((ue[:, None] - ne) ** 2, -1) + 1e-12)
            d_uj = jnp.min(d_ujs, axis=1)
            hinge = jnp.maximum(0.0, margin - (d_uj - d_ui))
            impostors = (d_ui[:, None] - d_ujs + margin) > 0
            rank = jnp.mean(impostors.astype(jnp.float32), axis=1) * num_items
            w_ui = jnp.log(rank + 1.0)
            loss = jnp.sum(w_ui * hinge * w)

            j_idx = jnp.argmin(d_ujs, axis=1)
            chosen = jnp.take_along_axis(neg, j_idx[:, None], axis=1)[:, 0]
            item_rows = jnp.concatenate([pe, p["item_emb"][chosen]], axis=0)
            w2 = jnp.concatenate([w, w])
            f2 = cov_loss(ue, w) + cov_loss(item_rows, w2)
            return loss + reg * f2, chosen

        def train_step(carry, batch):
            params, opt_state = carry
            (loss, chosen), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            users, pos, _, _ = batch
            params = dict(params)
            params["user_emb"] = _clip_rows_by_norm(params["user_emb"], users,
                                                    clip_norm)
            item_rows = jnp.concatenate([pos, chosen])
            params["item_emb"] = _clip_rows_by_norm(params["item_emb"],
                                                    item_rows, clip_norm)
            return (params, opt_state), loss

        self._train_step = train_step
        self._finalize_setup(run_config.seed)

        score = CML._topk_score_fn

        @jax.jit
        def predict_fn(p, users):
            # SAME expanded-euclidean form as the chunked/TP eval paths —
            # one formulation everywhere so rankings agree on near-ties
            # (advisor r4)
            return score(p["user_emb"][users], p["item_emb"], None)

        self._predict_fn = predict_fn

    # -- tensor-parallel eval (round 4): metric-learning score is not a
    # dot, so predict_topk routes a custom _topk_score_fn through the
    # catalog shards (the SGAT pattern) — expanded euclidean, never
    # materializing (B, S, d) per shard; fused dot_topk stays disabled
    # (no activation/score hook there).

    def _user_vectors(self, users):
        import jax.numpy as jnp
        return self.params["user_emb"][jnp.asarray(users)]

    def _topk_factors(self, uv):
        return uv, self.params["item_emb"], None

    @staticmethod
    def _topk_score_fn(uv, items, bias):
        import jax.numpy as jnp
        d2 = (jnp.sum(uv * uv, -1)[:, None] - 2.0 * (uv @ items.T)
              + jnp.sum(items * items, -1)[None, :])
        s = -jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
        return s if bias is None else s + bias[None, :]

    def predict_chunk(self, users, item_lo: int, item_hi: int) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._topk_score_fn(self.params["user_emb"][users],
                                   self.params["item_emb"][item_lo:item_hi],
                                   None)
