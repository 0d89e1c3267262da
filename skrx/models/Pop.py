"""Pop — popularity baseline.

Behavioral parity with reference skrec/recommender/Pop.py:26-44: score of an
item is its training interaction count, identical for every user.
"""
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..run_config import RunConfig
from ..utils import ModelConfig
from .base import JaxRecommender

__all__ = ["Pop", "PopConfig"]


class PopConfig(ModelConfig):
    epochs: int = 1
    early_stop: int = 0

    def _validate(self):
        assert isinstance(self.epochs, int) and self.epochs >= 0


class Pop(JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = PopConfig(**model_config)
        super().__init__(run_config, self.config)
        pairs = self.dataset.train_data.to_user_item_pairs()
        counts = np.bincount(pairs[:, 1],
                             minlength=self.dataset.num_items).astype(np.float32)
        self._scores = jnp.asarray(counts)

    def _train_epoch(self, epoch: int):
        return None  # nothing to train

    def predict(self, users) -> jnp.ndarray:
        users = np.asarray(users)
        return jnp.broadcast_to(self._scores[None, :],
                                (len(users), self._scores.shape[0]))
