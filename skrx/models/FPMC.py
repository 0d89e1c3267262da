"""FPMC — Factorized Personalized Markov Chains.

Paper: Rendle et al., "Factorizing Personalized Markov Chains for
Next-Basket Recommendation" (WWW 2010).

Behavioral parity with reference skrec/recommender/FPMC.py:23-150: four
embedding tables (UI user, IU item-given-user, IL item-given-last,
LI last-item), score = <UI_u, IU_i> + <LI_last, IL_i>, summed BPR + L2 reg
over batch embeddings, Adam; predict scores the whole catalog from each
user's chronologically last training item.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import bpr_loss, get_initializer
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import SequentialPairwiseEpochPipeline

__all__ = ["FPMC", "FPMCConfig"]


class FPMCConfig(ModelConfig):
    lr: float = 1e-3
    reg: float = 1e-3
    embed_size: int = 64
    # "adam" (dense, reference parity) or "lazy_adam" (row-wise sparse
    # moments, O(B*D) update instead of O(N*D) — for huge catalogs;
    # skrx/ops/optim.py has the break-even numbers)
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


class FPMC(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = FPMCConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        self.user_pos_dict = self.dataset.train_data.to_user_dict_by_time()

        init = get_initializer("normal")
        keys = jax.random.split(jax.random.key(run_config.seed), 4)
        d = cfg.embed_size
        self.params = {
            "UI": init(keys[0], (self.num_users, d)),
            "IU": init(keys[1], (self.num_items, d)),
            "IL": init(keys[2], (self.num_items, d)),
            "LI": init(keys[3], (self.num_items, d)),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = SequentialPairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size, num_previous=1, num_next=1, mesh=self.mesh)
        reg = cfg.reg

        def loss_fn(p, batch):
            users, pos, neg, w, prev = batch
            neg = neg[:, 0]
            last = prev[:, 0]
            ui = p["UI"][users]
            last_li = p["LI"][last]
            y_pos = jnp.sum(ui * p["IU"][pos], -1) + jnp.sum(last_li * p["IL"][pos], -1)
            y_neg = jnp.sum(ui * p["IU"][neg], -1) + jnp.sum(last_li * p["IL"][neg], -1)
            loss = jnp.sum(bpr_loss(y_pos, y_neg) * w)
            reg_term = 0.5 * jnp.sum(jnp.sum(
                ui ** 2 + last_li ** 2 + p["IU"][pos] ** 2 + p["IU"][neg] ** 2
                + p["IL"][pos] ** 2 + p["IL"][neg] ** 2, -1) * w)
            return loss + reg * reg_term

        if cfg.optimizer == "lazy_adam":
            from ..ops.optim import make_lazy_train_step

            def gathered_loss(gathered, dense, batch):
                users, pos, neg, w, prev = batch
                ui, iu_p, iu_n, il_p, il_n, li_l = gathered
                y_pos = jnp.sum(ui * iu_p, -1) + jnp.sum(li_l * il_p, -1)
                y_neg = jnp.sum(ui * iu_n, -1) + jnp.sum(li_l * il_n, -1)
                loss = jnp.sum(bpr_loss(y_pos, y_neg) * w)
                reg_term = 0.5 * jnp.sum(jnp.sum(
                    ui ** 2 + li_l ** 2 + iu_p ** 2 + iu_n ** 2
                    + il_p ** 2 + il_n ** 2, -1) * w)
                return loss + reg * reg_term

            gathers = [("UI", lambda b: b[0]),
                       ("IU", lambda b: b[1]),
                       ("IU", lambda b: b[2][:, 0]),
                       ("IL", lambda b: b[1]),
                       ("IL", lambda b: b[2][:, 0]),
                       ("LI", lambda b: b[4][:, 0])]
            self._train_step, self.opt_state = make_lazy_train_step(
                cfg.lr, gathers, gathered_loss, self.params)
            self._rng = jax.random.key(run_config.seed + 1)
        else:
            self._finalize_setup_flat(run_config.seed, loss_fn)

        # Last training item per user for prediction (FPMC.py:147-150).
        last_items = np.zeros(self.num_users, dtype=np.int32)
        for u, seq in self.user_pos_dict.items():
            last_items[u] = seq[-1]
        self._last_items = jnp.asarray(last_items)

        @jax.jit
        def predict_fn(p, users):
            ui = p["UI"][users]
            last = p["LI"][self._last_items[users]]
            return ui @ p["IU"].T + last @ p["IL"].T

        self._predict_fn = predict_fn

    def _chunk_embeddings(self):
        # score = <UI_u, IU_i> + <LI_last(u), IL_i> == one concatenated dot
        # (round 4): uv = [UI_u | LI_last(u)], table = [IU | IL].
        # Memoized on params identity: fresh concats per call would defeat
        # the serving packed-table cache (keyed by table id).
        p = self.params
        cached = getattr(self, "_concat_cache", None)
        if cached is None or cached[0] is not p:
            u_all = jnp.concatenate([p["UI"], p["LI"][self._last_items]],
                                    axis=1)
            i_all = jnp.concatenate([p["IU"], p["IL"]], axis=1)
            self._concat_cache = (p, (u_all, i_all))
        return self._concat_cache[1]

    def predict_chunk(self, users, item_lo: int, item_hi: int) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        p = self.params
        ui = p["UI"][users]
        last = p["LI"][self._last_items[users]]
        return ui @ p["IU"][item_lo:item_hi].T + last @ p["IL"][item_lo:item_hi].T
