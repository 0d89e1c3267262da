"""AOBPR — BPR with adaptive rank-biased oversampling of negatives.

Paper: Rendle & Freudenthaler, "Improving Pairwise Learning for Item
Recommendation from Implicit Feedback" (WSDM 2014).

Behavioral parity with reference skrec/recommender/AOBPR/ (AOBPR.py:24-97,
pyx_aobpr_func.pyx:44-143): uniform[0,1) embedding init; per-example rank
index drawn from exp(-rank/alpha); per-example factor sampled with
probability |u_f|*sigma_f; negative = the rank-th item in the sampled
factor's descending order (ascending when u_f < 0); plain SGD BPR step with
weight decay; the per-factor item ranking is recomputed every
~N*ln(N) examples.

TPU re-design (documented deviation, SURVEY §2.2/§7.3): the reference's
strictly sequential per-interaction C loop cannot be SPMD. Here updates are
applied in minibatches — within a batch, SGD deltas for rows touched more
than once are summed (scatter-add) instead of applied sequentially — and the
factor re-sorting happens on device (`jnp.argsort` per factor) every
ceil(N*ln(N)/batch) batches, matching the reference's cadence in examples.
(The reference's scalar loop additionally reads the just-updated user vector
inside the same step's item updates, pyx_aobpr_func.pyx:38-41; the batched
form uses the pre-step values throughout.) Metric parity, not step-for-step
parity, is the target.
"""
from functools import partial
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..run_config import RunConfig
from ..utils import ModelConfig
from .base import JaxRecommender
from .common import ChunkedDotPredictMixin
from .pipeline import pad_to_batches

__all__ = ["AOBPR", "AOBPRConfig"]


class AOBPRConfig(ModelConfig):
    lr: float = 1e-2
    reg: float = 5e-2
    embed_size: int = 64
    alpha: int = 6682
    batch_size: int = 1024   # minibatch size of the vectorized reformulation
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        assert isinstance(self.alpha, int) and self.alpha > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class AOBPR(ChunkedDotPredictMixin, JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = AOBPRConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_items, d = self.num_items, cfg.embed_size

        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {
            "user_emb": jax.random.uniform(k_u, (self.num_users, d)),
            "item_emb": jax.random.uniform(k_i, (num_items, d)),
        }

        pairs = self.dataset.train_data.to_user_item_pairs()
        users_p, weights = pad_to_batches(pairs[:, 0], cfg.batch_size)
        pos_p, _ = pad_to_batches(pairs[:, 1], cfg.batch_size)
        self._users = jnp.asarray(users_p)
        self._pos = jnp.asarray(pos_p)
        self._w = jnp.asarray(weights)
        self._nb = len(users_p) // cfg.batch_size
        self._rng = jax.random.key(run_config.seed + 1)

        rank = np.arange(1, num_items + 1)
        rank_prob = np.exp(-rank / cfg.alpha)
        self._rank_logits = jnp.asarray(np.log(rank_prob).astype(np.float32))

        # reference re-sorts every N*ln(N) examples (pyx_aobpr_func.pyx:122)
        resort_every = max(1, round(num_items * math.log(max(num_items, 2))
                                    / cfg.batch_size))
        lr, reg = cfg.lr, cfg.reg
        nb, bsz = self._nb, cfg.batch_size

        def sort_factors(item_emb):
            sorted_items = jnp.argsort(-item_emb, axis=0)      # (N, D)
            std = jnp.std(item_emb, axis=0)
            return sorted_items, std

        def step(carry, batch):
            params, sorted_items, std, key, b_idx = carry
            users, pos, rank_idx, w = batch
            key, k_f = jax.random.split(key)

            # refresh per-factor ranking on cadence
            # b_idx > 0: the epoch entry already sorted before the scan,
            # so firing the cadence at step 0 would duplicate the full sort
            sorted_items, std = jax.lax.cond(
                (b_idx % resort_every == 0) & (b_idx > 0),
                lambda p: sort_factors(p["item_emb"]),
                lambda p: (sorted_items, std), params)

            ue = params["user_emb"][users]                     # (B, D)
            fprob = jnp.abs(ue) * std[None, :]
            factor = jax.random.categorical(k_f, jnp.log(fprob + 1e-24), axis=-1)
            u_f = jnp.take_along_axis(ue, factor[:, None], axis=1)[:, 0]
            row = jnp.where(u_f > 0, rank_idx, num_items - rank_idx - 1)
            neg = sorted_items[row, factor]

            ie = params["item_emb"][pos]
            je = params["item_emb"][neg]
            x_uij = jnp.sum(ue * (ie - je), -1)
            cmg = (jax.nn.sigmoid(-x_uij) * w)[:, None]        # (B, 1)

            du = lr * (cmg * (ie - je) - reg * ue * w[:, None])
            di = lr * (cmg * ue - reg * ie * w[:, None])
            dj = lr * (-cmg * ue - reg * je * w[:, None])
            params = {
                "user_emb": params["user_emb"].at[users].add(du),
                "item_emb": params["item_emb"].at[pos].add(di).at[neg].add(dj),
            }
            loss = jnp.sum(-jax.nn.log_sigmoid(x_uij) * w)
            return (params, sorted_items, std, key, b_idx + 1), loss

        mesh = self.mesh

        @partial(jax.jit, donate_argnums=0)
        def run_epoch(params, users, pos, w, key):
            from .pipeline import _shard_batches
            k_perm, k_rank, k_steps = jax.random.split(key, 3)
            s = users.shape[0]
            perm = jax.random.permutation(k_perm, s)
            users, pos, w = users[perm], pos[perm], w[perm]
            rank_idx = jax.random.categorical(
                k_rank, self._rank_logits, shape=(s,)).astype(jnp.int32)
            sorted_items, std = sort_factors(params["item_emb"])
            batches = _shard_batches(
                mesh, (users.reshape(nb, bsz), pos.reshape(nb, bsz),
                       rank_idx.reshape(nb, bsz), w.reshape(nb, bsz)))
            (params, _, _, _, _), losses = jax.lax.scan(
                step, (params, sorted_items, std, k_steps, 0), batches)
            return params, jnp.sum(losses) / jnp.maximum(jnp.sum(w), 1.0)

        self._run_epoch = run_epoch

        @jax.jit
        def predict_fn(p, users):
            return p["user_emb"][users] @ p["item_emb"].T

        self._predict_fn = predict_fn

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        self.params, loss = self._run_epoch(self.params, self._users,
                                            self._pos, self._w, key)
        return float(loss)

    def predict(self, users) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._predict_fn(self.params, users)

    def _chunk_embeddings(self):
        # plain MF dot -> chunked/fused/TP eval families (round 4)
        return self.params["user_emb"], self.params["item_emb"]
