"""GRU4Rec+ — session RNN with additional sampled negatives and max losses.

Paper: Hidasi & Karatzoglou, "Recurrent Neural Networks with Top-k Gains for
Session-based Recommendations" (CIKM 2018).

Behavioral parity with reference skrec/recommender/GRU4RecPlus.py:24-324:
everything from GRU4Rec plus n_sample popularity^alpha sampled extra
negatives appended to each step's target list, and BPR-max / TOP1-max losses
with softmax-weighted negatives where the diagonal (positive) column is
masked out of the softmax. Negative sampling happens on device via
`jax.random.categorical` over the static popularity^alpha log-weights
(equivalent to the reference's inverse-CDF searchsorted draw when every item
occurs in training, which the preprocessor's remapping guarantees).
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..run_config import RunConfig
from ..utils import ModelConfig
from .GRU4Rec import GRU4Rec

__all__ = ["GRU4RecPlus", "GRU4RecPlusConfig"]


class GRU4RecPlusConfig(ModelConfig):
    lr: float = 0.001
    reg: float = 0.0
    bpr_reg: float = 1.0
    layers: list = None
    batch_size: int = 128
    loss: str = "bpr_max"      # top1_max | bpr_max
    hidden_act: str = "tanh"
    final_act: str = "linear"
    n_sample: int = 2048
    sample_alpha: float = 0.75
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        if self.layers is None:
            self.layers = [64]
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.bpr_reg, float) and self.bpr_reg >= 0
        assert isinstance(self.layers, list)
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert self.loss in {"top1_max", "bpr_max"}
        assert self.hidden_act in {"relu", "tanh"}
        assert self.final_act in {"linear", "relu", "leaky_relu"}
        assert isinstance(self.n_sample, int) and self.n_sample >= 0
        assert isinstance(self.sample_alpha, float) and 0 < self.sample_alpha <= 1


class GRU4RecPlus(GRU4Rec):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = GRU4RecPlusConfig(**model_config)
        super().__init__(run_config, model_config)

    def _init_extra(self, key):
        # popularity^alpha log-weights over the catalog (GRU4RecPlus.py:102-106)
        pairs = self.dataset.train_data.to_user_item_pairs()
        counts = np.bincount(pairs[:, 1], minlength=self.num_items) \
            .astype(np.float64)
        weights = np.power(np.maximum(counts, 0.0), self.config.sample_alpha)
        with np.errstate(divide="ignore"):
            logw = np.log(weights)
        logw[np.isneginf(logw)] = -1e30  # unseen items: ~zero probability
        self._neg_log_weights = jnp.asarray(logw.astype(np.float32))

    def _step_targets(self, p, out_idx, key):
        if self.config.n_sample == 0:
            return out_idx
        neg = jax.random.categorical(key, self._neg_log_weights,
                                     shape=(self.config.n_sample,)) \
            .astype(jnp.int32)
        return jnp.concatenate([out_idx, neg])

    def _softmax_neg(self, logits):
        b, size_y = logits.shape
        hm = 1.0 - jnp.eye(b, size_y)
        masked = logits * hm
        masked = masked - jnp.max(masked, axis=1, keepdims=True)
        e_x = jnp.exp(masked) * hm
        return e_x / jnp.sum(e_x, axis=1, keepdims=True)

    def _loss_from_logits(self, logits):
        w = self._softmax_neg(logits)
        pos = jnp.diagonal(logits)[:, None]
        if self.config.loss == "bpr_max":
            prob = jnp.sum(jax.nn.sigmoid(pos - logits) * w, axis=1)
            loss = -jnp.log(prob + 1e-24)
            reg_loss = jnp.sum(jnp.square(logits) * w, axis=1)
            return jnp.mean(loss + self.config.bpr_reg * reg_loss)
        prob = jax.nn.sigmoid(logits - pos) + jax.nn.sigmoid(jnp.square(logits))
        return jnp.mean(jnp.sum(prob * w, axis=1))
