"""SRGNN — session-based recommendation with graph neural networks.

Paper: Wu et al., "Session-based Recommendation with Graph Neural Networks"
(AAAI 2019).

Behavioral parity with reference skrec/recommender/SRGNN.py:24-287: one
training example per sequence prefix (seq -> next item), sessions truncated
to max_seq_len; per-session directed transition graph over unique nodes with
in/out degree normalization; `step` gated-GNN propagations (GRU cell over
[A_in@(hW_in+b), A_out@(hW_out+b)]); attention session embedding (sigmoid
scoring against the last node) with hybrid concat + B projection
(nonhybrid skips the concat); softmax CE over the catalog; L2 over all
params; Adam with staircase exponential LR decay; uniform(+-1/sqrt(d)) init;
pad item embedding fixed at zero.

TPU re-design: unique-node/alias tables are precomputed host-side once
(they are static per dataset), padded to the global (N_max, L_max) bucket;
the per-session adjacency is scattered ON DEVICE inside the jitted step, and
each epoch is one `lax.scan` over the reference's two-level shuffled,
drop-last batch schedule.
"""
from functools import partial
import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.rnn import gru_init, gru_step
from ..run_config import RunConfig
from ..utils import ModelConfig
from .base import JaxRecommender
from .common import CachedUserVecChunkMixin

__all__ = ["SRGNN", "SRGNNConfig"]


class SRGNNConfig(ModelConfig):
    lr: float = 1e-3
    l2_reg: float = 1e-5
    hidden_size: int = 64
    lr_dc: float = 0.1
    lr_dc_step: int = 3
    step: int = 1
    nonhybrid: bool = False
    max_seq_len: int = 200
    batch_size: int = 256
    epochs: int = 500
    early_stop: int = 50

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.l2_reg, float) and self.l2_reg >= 0
        assert isinstance(self.hidden_size, int) and self.hidden_size > 0
        assert isinstance(self.step, int) and self.step > 0
        assert isinstance(self.nonhybrid, bool)
        assert isinstance(self.max_seq_len, int) and self.max_seq_len > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _prepare_sessions(seqs: List[np.ndarray], l_max: int, n_max: int,
                      pad_id: int):
    """nodes (S, n_max), alias (S, l_max), lengths (S,)."""
    s = len(seqs)
    nodes = np.full((s, n_max), pad_id, dtype=np.int32)
    alias = np.zeros((s, l_max), dtype=np.int32)
    lengths = np.zeros(s, dtype=np.int32)
    for i, seq in enumerate(seqs):
        uniq = np.unique(seq)
        id_map = {node: idx for idx, node in enumerate(uniq)}
        nodes[i, : len(uniq)] = uniq
        alias[i, : len(seq)] = [id_map[x] for x in seq]
        lengths[i] = len(seq)
    return nodes, alias, lengths


class SRGNN(CachedUserVecChunkMixin, JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = SRGNNConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_items = self.num_items
        pad_id = num_items
        d = cfg.hidden_size

        user_pos = self.dataset.train_data.to_user_dict_by_time()
        train_seq, train_tar = [], []
        for user, seqs in user_pos.items():
            for i in range(1, len(seqs)):
                train_seq.append(seqs[max(0, len(seqs) - i - cfg.max_seq_len):
                                      len(seqs) - i])
                train_tar.append(seqs[-i])
        self._n_examples = len(train_seq)

        test_seqs = [user_pos[u][-cfg.max_seq_len:] if u in user_pos
                     else np.array([0]) for u in range(self.num_users)]
        l_max = max(max((len(s) for s in train_seq), default=1),
                    max(len(s) for s in test_seqs))
        n_max = max(max((len(np.unique(s)) for s in train_seq), default=1),
                    max(len(np.unique(s)) for s in test_seqs))
        self._l_max, self._n_max = l_max, n_max

        nodes, alias, lengths = _prepare_sessions(train_seq, l_max, n_max, pad_id)
        self._nodes = jnp.asarray(nodes)
        self._alias = jnp.asarray(alias)
        self._lengths = jnp.asarray(lengths)
        self._targets = jnp.asarray(np.asarray(train_tar, dtype=np.int32))
        t_nodes, t_alias, t_lengths = _prepare_sessions(test_seqs, l_max,
                                                        n_max, pad_id)
        self._t_nodes = jnp.asarray(t_nodes)
        self._t_alias = jnp.asarray(t_alias)
        self._t_lengths = jnp.asarray(t_lengths)

        stdv = 1.0 / math.sqrt(d)
        uni = lambda k, shape: jax.random.uniform(k, shape, minval=-stdv,
                                                  maxval=stdv)
        keys = jax.random.split(jax.random.key(run_config.seed), 12)
        self.params = {
            "embedding": uni(keys[0], (num_items, d)),
            "nasr_w1": uni(keys[1], (d, d)),
            "nasr_w2": uni(keys[2], (d, d)),
            "nasr_v": uni(keys[3], (1, d)),
            "nasr_b": jnp.zeros((d,)),
            "W_in": uni(keys[4], (d, d)), "b_in": uni(keys[5], (d,)),
            "W_out": uni(keys[6], (d, d)), "b_out": uni(keys[7], (d,)),
            "B": uni(keys[8], (2 * d, d)),
            "gru": gru_init(keys[9], 2 * d, d),
        }
        decay_steps = max(int(cfg.lr_dc_step * self._n_examples
                              / cfg.batch_size), 1)
        schedule = optax.exponential_decay(cfg.lr, decay_steps, cfg.lr_dc,
                                           staircase=True)
        self.optimizer = optax.adam(schedule)
        self.opt_state = self.optimizer.init(self.params)
        self._np_seed = run_config.seed

        step_n, nonhybrid, l2_reg = cfg.step, cfg.nonhybrid, cfg.l2_reg
        # clamp so tiny datasets still form one training batch (a
        # zero-batch epoch would yield a NaN mean loss and abort fit())
        bsz = max(1, min(cfg.batch_size, len(train_seq)))

        def session_embed(p, nodes_b, alias_b, len_b):
            b = nodes_b.shape[0]
            emb_table = jnp.concatenate(
                [p["embedding"], jnp.zeros((1, d))], axis=0)
            fin = emb_table[nodes_b]                         # (B, N, D)

            # per-session transition adjacency from alias pairs (scatter=1)
            t_idx = jnp.arange(l_max - 1)
            valid = (t_idx[None, :] < (len_b[:, None] - 1)).astype(jnp.float32)
            prev_a = alias_b[:, :-1]
            next_a = alias_b[:, 1:]
            b_idx = jnp.broadcast_to(jnp.arange(b)[:, None], prev_a.shape)
            adj = jnp.zeros((b, n_max, n_max))
            adj = adj.at[b_idx, prev_a, next_a].max(valid)
            sum_in = jnp.maximum(jnp.sum(adj, axis=1), 1.0)    # col sums
            a_in = adj / sum_in[:, None, :]
            sum_out = jnp.maximum(jnp.sum(adj, axis=2), 1.0)   # row sums
            a_out = jnp.swapaxes(adj, 1, 2) / sum_out[:, None, :]

            for _ in range(step_n):
                fin_in = fin @ p["W_in"] + p["b_in"]
                fin_out = fin @ p["W_out"] + p["b_out"]
                av = jnp.concatenate([jnp.einsum("bnm,bmd->bnd", a_in, fin_in),
                                      jnp.einsum("bnm,bmd->bnd", a_out, fin_out)],
                                     axis=-1)                  # (B, N, 2D)
                fin = gru_step(p["gru"], av.reshape(-1, 2 * d),
                               fin.reshape(-1, d)).reshape(b, n_max, d)

            # attention session embedding
            last_alias = jnp.take_along_axis(
                alias_b, jnp.maximum(len_b - 1, 0)[:, None], axis=1)[:, 0]
            last_h = jnp.take_along_axis(
                fin, last_alias[:, None, None].repeat(d, axis=2), axis=1)[:, 0]
            seq_h = jnp.take_along_axis(
                fin, alias_b[:, :, None].repeat(d, axis=2), axis=1)  # (B, L, D)
            mask = (jnp.arange(l_max)[None, :] < len_b[:, None]) \
                .astype(jnp.float32)
            last_proj = last_h @ p["nasr_w1"]
            m = jax.nn.sigmoid(last_proj[:, None, :]
                               + seq_h @ p["nasr_w2"] + p["nasr_b"])
            coef = (m @ p["nasr_v"].T)[..., 0] * mask            # (B, L)
            attn = jnp.sum(coef[:, :, None] * seq_h, axis=1)
            if nonhybrid:
                sess = attn
            else:
                # the reference concatenates the nasr_w1-PROJECTED last state
                # (SRGNN.py:154-163), not the raw last_h
                sess = jnp.concatenate([attn, last_proj], axis=-1) @ p["B"]
            return sess                                       # (B, D')

        self._session_embed = session_embed
        self._session_embed_jit = jax.jit(session_embed)

        def session_logits(p, nodes_b, alias_b, len_b):
            return session_embed(p, nodes_b, alias_b, len_b) \
                @ p["embedding"].T                               # (B, N_items)

        self._session_logits = session_logits

        def train_step(carry, batch):
            params, opt_state = carry
            nodes_b, alias_b, len_b, targets = batch

            def loss_fn(p):
                logits = session_logits(p, nodes_b, alias_b, len_b)
                ce = -jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                          targets[:, None], axis=1)[:, 0]
                loss = jnp.mean(ce)
                l2 = sum(0.5 * jnp.sum(jnp.square(x))
                         for x in jax.tree_util.tree_leaves(p))
                return loss + l2_reg * l2

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        mesh = self.mesh

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, order):
            from .pipeline import _shard_batches
            nb = order.shape[0] // bsz
            order = order[: nb * bsz].reshape(nb, bsz)
            batches = _shard_batches(
                mesh, (self._nodes[order], self._alias[order],
                       self._lengths[order], self._targets[order]))
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state), batches)
            return params, opt_state, jnp.mean(losses)

        self._run_epoch = run_epoch

        @jax.jit
        def predict_fn(p, users):
            return session_logits(p, self._t_nodes[users],
                                  self._t_alias[users],
                                  self._t_lengths[users])

        self._predict_fn = predict_fn

        # tower eval contract (round 4): the session score is
        # sess_emb @ embedding.T — SRGNN joins the chunked/fused/TP
        # evaluation families (encoder per batch, dot sharded/paged)

    def _shuffled_order(self, epoch: int) -> np.ndarray:
        """Two-level shuffle over length-sorted indices
        (SRGNN.py:220-231): chunk the descending-length order into
        batch_size*32 chunks, shuffle chunk order, shuffle within chunks."""
        lengths = np.asarray(self._lengths)
        order = np.argsort(-lengths, kind="stable")
        chunk = self.config.batch_size * 32
        chunks = [order[i: i + chunk] for i in range(0, len(order), chunk)]
        rng = np.random.default_rng((self._np_seed, epoch))  # resume-determ.
        rng.shuffle(chunks)
        out = []
        for c in chunks:
            c = c.copy()
            rng.shuffle(c)
            out.append(c)
        return np.concatenate(out).astype(np.int32)

    def _train_epoch(self, epoch: int) -> float:
        order = jnp.asarray(self._shuffled_order(epoch))
        self.params, self.opt_state, loss = self._run_epoch(
            self.params, self.opt_state, order)
        return float(loss)

    def predict(self, users) -> jnp.ndarray:
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._predict_fn(self.params, users)

    def _user_vectors(self, users):
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._session_embed_jit(self.params, self._t_nodes[users],
                                       self._t_alias[users],
                                       self._t_lengths[users])

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        return uv @ self.params["embedding"][item_lo:item_hi].T

    def _topk_factors(self, uv):
        return uv, self.params["embedding"], None
