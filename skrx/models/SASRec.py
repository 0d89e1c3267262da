"""SASRec — self-attentive sequential recommendation.

Paper: Kang & McAuley, "Self-Attentive Sequential Recommendation"
(ICDM 2018).

Behavioral parity with reference skrec/recommender/SASRec.py:23-498: one
training row per user (seq = items[:-1], targets = items[1:], both
pre-padded to max_len with pad id = num_items); item embeddings scaled by
sqrt(d) with a zero pad row; learned positional embeddings; num_blocks of
(pre-LN query) multi-head causal attention + conv1 FFN with the reference's
key/query masking quirks (skrx/ops/attention.py); final LN; per-position
sigmoid-CE on pos/neg logits with pad masking; per-epoch per-position
negative resampling with per-user exclusion; Adam(beta2=0.98); l2_emb reg on
item + position tables; predict scores the catalog from the last hidden
state (pad column removed).

TPU re-design: negatives are sampled on device and the whole epoch is one
jitted `lax.scan`.
"""
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.attention import (dense, dropout, feedforward_conv1, layer_norm,
                             multihead_attention_kyubyong)
from ..ops.sampling import sample_negatives
from ..run_config import RunConfig
from ..utils import ModelConfig, pad_sequences
from .base import JaxRecommender
from .common import CachedUserVecChunkMixin
from .pipeline import _shard_batches, pad_to_batches

__all__ = ["SASRec", "SASRecConfig"]


class SASRecConfig(ModelConfig):
    lr: float = 0.001
    l2_emb: float = 0.0
    hidden_units: int = 64
    dropout_rate: float = 0.5
    max_len: int = 50
    num_blocks: int = 2
    num_heads: int = 1
    batch_size: int = 128
    epochs: int = 1000
    early_stop: int = 100
    # "bfloat16" runs the transformer blocks in bf16 (f32 master weights,
    # f32 logits/loss). Measured: metrics within noise (NDCG@10 0.0914 vs
    # 0.0908 f32); speed parity at d=128 (model is bandwidth-bound there) —
    # the win appears at d >= 512 where the MXU dominates.
    compute_dtype: str = "float32"

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.l2_emb, float) and self.l2_emb >= 0
        assert isinstance(self.hidden_units, int) and self.hidden_units > 0
        assert isinstance(self.dropout_rate, float) and 0 <= self.dropout_rate < 1
        assert isinstance(self.max_len, int) and self.max_len > 0
        assert isinstance(self.num_blocks, int) and self.num_blocks > 0
        assert isinstance(self.num_heads, int) and self.num_heads > 0
        assert self.hidden_units % self.num_heads == 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert self.compute_dtype in ("float32", "bfloat16")


def _xavier(key, shape):
    return jax.nn.initializers.glorot_uniform()(key, shape)


class SASRec(CachedUserVecChunkMixin, JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = SASRecConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        pad_id = self.num_items
        L, d = cfg.max_len, cfg.hidden_units

        user_pos = self.dataset.train_data.to_user_dict_by_time()
        train_users = np.asarray(list(user_pos.keys()), dtype=np.int32)
        seqs = pad_sequences([user_pos[u][:-1] for u in train_users],
                             value=pad_id, max_len=L, padding="pre",
                             truncating="pre")
        poss = pad_sequences([user_pos[u][1:] for u in train_users],
                             value=pad_id, max_len=L, padding="pre",
                             truncating="pre")

        pp = self.dataset.train_data.to_padded_positive_table()
        self._pos_table = jnp.asarray(pp.table)

        users_p, weights = pad_to_batches(train_users, cfg.batch_size)
        seqs_p, _ = pad_to_batches(seqs, cfg.batch_size)
        poss_p, _ = pad_to_batches(poss, cfg.batch_size)
        self._users = jnp.asarray(users_p)
        self._seqs = jnp.asarray(seqs_p)
        self._poss = jnp.asarray(poss_p)
        self._w = jnp.asarray(weights)
        self._num_batches = len(users_p) // cfg.batch_size
        self._batch_size = cfg.batch_size

        keys = jax.random.split(jax.random.key(run_config.seed), 3 + cfg.num_blocks)
        blocks = []
        for i in range(cfg.num_blocks):
            bk = jax.random.split(keys[3 + i], 8)
            blocks.append({
                "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
                "att": {"q": {"w": _xavier(bk[0], (d, d)), "b": jnp.zeros((d,))},
                        "k": {"w": _xavier(bk[1], (d, d)), "b": jnp.zeros((d,))},
                        "v": {"w": _xavier(bk[2], (d, d)), "b": jnp.zeros((d,))}},
                "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
                "ffn": {"ff1": {"w": _xavier(bk[3], (d, d)), "b": jnp.zeros((d,))},
                        "ff2": {"w": _xavier(bk[4], (d, d)), "b": jnp.zeros((d,))}},
            })
        self.params = {
            "item_emb": _xavier(keys[0], (self.num_items, d)),
            "pos_emb": _xavier(keys[1], (L, d)),
            "blocks": blocks,
            "ln_f_s": jnp.ones((d,)), "ln_f_b": jnp.zeros((d,)),
        }
        self.optimizer = optax.adam(cfg.lr, b2=0.98)
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)

        num_blocks, num_heads = cfg.num_blocks, cfg.num_heads
        drop_rate, l2_emb = cfg.dropout_rate, cfg.l2_emb
        num_items = self.num_items

        compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                         else jnp.float32)

        def item_table(p):
            # zero pad row, then sqrt(d) scaling (SASRec.py:371-377)
            table = jnp.concatenate(
                [p["item_emb"], jnp.zeros((1, d), p["item_emb"].dtype)], axis=0)
            return table * (d ** 0.5)

        def encode(p, seq_ids, rng=None):
            if compute_dtype != jnp.float32:
                # mixed precision: f32 master params, bf16 block compute
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if a.dtype == jnp.float32 else a, p)
            table = item_table(p)
            seq = table[seq_ids] + p["pos_emb"][None, :, :]
            if rng is not None:
                rng, sub = jax.random.split(rng)
                seq = dropout(sub, seq, drop_rate)
            mask = (seq_ids != pad_id).astype(seq.dtype)[:, :, None]
            seq = seq * mask
            for i in range(num_blocks):
                blk = p["blocks"][i]
                k1 = k2 = None
                if rng is not None:
                    rng, k1, k2 = jax.random.split(rng, 3)
                q = layer_norm(seq, blk["ln1_s"], blk["ln1_b"])
                seq = multihead_attention_kyubyong(blk["att"], q, seq,
                                                   num_heads, causal=True,
                                                   dropout_rate=drop_rate,
                                                   rng=k1)
                h = layer_norm(seq, blk["ln2_s"], blk["ln2_b"])
                seq = feedforward_conv1(blk["ffn"], h, drop_rate, k2)
                seq = seq * mask
            out = layer_norm(seq, p["ln_f_s"], p["ln_f_b"])  # (B, L, D)
            return out.astype(jnp.float32)

        def loss_fn(p, batch, rng):
            seq_ids, pos_ids, neg_ids, w = batch
            hidden = encode(p, seq_ids, rng)                  # (B, L, D)
            table = item_table(p)
            pos_emb = table[pos_ids]
            neg_emb = table[neg_ids]
            pos_logits = jnp.sum(hidden * pos_emb, -1)
            neg_logits = jnp.sum(hidden * neg_emb, -1)
            is_target = ((pos_ids != pad_id).astype(jnp.float32)
                         * w[:, None])
            pos_loss = -jnp.log(jax.nn.sigmoid(pos_logits) + 1e-24) * is_target
            neg_loss = -jnp.log(1 - jax.nn.sigmoid(neg_logits) + 1e-24) * is_target
            loss = jnp.sum(pos_loss + neg_loss) / jnp.maximum(
                jnp.sum(is_target), 1.0)
            if l2_emb > 0:
                loss += l2_emb * 0.5 * (jnp.sum(p["item_emb"] ** 2)
                                        + jnp.sum(p["pos_emb"] ** 2))
            return loss

        def train_step(carry, batch):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        nb, bsz = self._num_batches, self._batch_size
        mesh = self.mesh

        @partial(jax.jit, donate_argnums=(1, 2))
        def run_epoch(key, params, opt_state, users, seqs, poss, w, pos_table):
            k_perm, k_neg, k_steps = jax.random.split(key, 3)
            s = users.shape[0]
            perm = jax.random.permutation(k_perm, s)
            users, seqs, poss, w = users[perm], seqs[perm], poss[perm], w[perm]
            # per-position negatives, exclusion vs all user positives
            neg = sample_negatives(k_neg, users, pos_table, num_items,
                                   num_neg=L, num_trials=8)
            neg = jnp.where(poss != pad_id, neg, pad_id)
            batches = _shard_batches(mesh, (
                seqs.reshape(nb, bsz, L), poss.reshape(nb, bsz, L),
                neg.reshape(nb, bsz, L), w.reshape(nb, bsz)))
            (params, opt_state, _), losses = jax.lax.scan(
                train_step, (params, opt_state, k_steps), batches)
            return params, opt_state, jnp.mean(losses)

        self._run_epoch = run_epoch

        # test sequences: full history, pre-padded (SASRec.py:337-343)
        test_seqs = pad_sequences(
            [user_pos[u][-L:] if u in user_pos else [pad_id]
             for u in range(self.num_users)],
            value=pad_id, max_len=L, padding="pre", truncating="pre")
        self._test_seqs = jnp.asarray(test_seqs)

        @jax.jit
        def user_vec_fn(p, users):
            hidden = encode(p, self._test_seqs[users], None)
            return hidden[:, -1, :]

        @jax.jit
        def predict_fn(p, users):
            return user_vec_fn(p, users) @ item_table(p)[:-1].T  # pad col removed

        @partial(jax.jit, static_argnames=("width",))
        def score_chunk_fn(p, uv, lo, *, width):
            # slice BEFORE scaling: only touches `width` rows of the table;
            # chunks cover [0, num_items) so the pad row is never reached
            tbl = jax.lax.dynamic_slice_in_dim(p["item_emb"], lo, width)
            return uv @ (tbl * (d ** 0.5)).T

        self._predict_fn = predict_fn
        self._user_vec_fn = user_vec_fn
        self._score_chunk_fn = score_chunk_fn

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        self.params, self.opt_state, loss = self._run_epoch(
            key, self.params, self.opt_state, self._users, self._seqs,
            self._poss, self._w, self._pos_table)
        return float(loss)

    def predict(self, users) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._predict_fn(self.params, users)

    def _user_vectors(self, users):
        return self._user_vec_fn(self.params, users)

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        return self._score_chunk_fn(self.params, uv, item_lo,
                                    width=item_hi - item_lo)

    def _topk_factors(self, uv):
        # predict == uv @ (item_emb * sqrt(d)).T over the N real items
        d = self.config.hidden_units
        return uv, self.params["item_emb"] * (d ** 0.5), None
