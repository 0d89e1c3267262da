"""SGAT — sequence-graph attention with translation scoring.

Paper: Sun et al. — sequential recommendation with item-transition graph
attention (skrec reference model).

Behavioral parity with reference skrec/recommender/SGAT.py:28-336: directed
item-item graph from consecutive pairs, one occurrence per (tail, head,
user) with per-user "relation" embeddings; attention logit =
-l2(h_emb + u_emb, t_emb) passed through the reference's global min-max
``mexp`` normalization, summed per edge and softmax-normalized per tail row;
n_layers aggregation item += att @ items; TransRec-style scoring from
(masked-mean history + last item + user) with item bias; summed BPR + L2
reg; Adam; truncated-normal(0.01) init; graph tensors cached under
``_sgat_data/``; item embeddings frozen into a predict table per evaluation.

TPU re-design: the reference's cumsum-gather segment trick becomes direct
`segment_sum` over occurrence->edge and edge->row index maps.
"""
import os
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import CachedUserVecChunkMixin, EpochTrainedRecommender
from .pipeline import SequentialPairwiseEpochPipeline

__all__ = ["SGAT", "SGATConfig"]


class SGATConfig(ModelConfig):
    lr: float = 0.001
    reg: float = 1e-4
    n_layers: int = 5
    n_seqs: int = 5
    n_next: int = 3
    embed_size: int = 64
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 1024
    epochs: int = 500
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.n_layers, int) and self.n_layers >= 0
        assert isinstance(self.n_seqs, int) and self.n_seqs > 0
        assert isinstance(self.n_next, int) and self.n_next > 0
        assert isinstance(self.embed_size, int) and self.embed_size > 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _build_sgat_graph(user_pos_train, num_items):
    """occ_* arrays (one row per (t,h,user) occurrence, grouped by sorted
    (t,h)), occurrence->edge ids, and edge (tail, head) lists."""
    th_rs = defaultdict(list)
    for user, pos_items in user_pos_train.items():
        for h, t in zip(pos_items[:-1], pos_items[1:]):
            th_rs[(t, h)].append(user)
    th_list = sorted(th_rs.items(), key=lambda x: x[0])
    occ_user, occ_head, occ_tail, occ_edge = [], [], [], []
    edge_tail, edge_head = [], []
    for e_idx, ((t, h), users) in enumerate(th_list):
        occ_user.extend(users)
        occ_head.extend([h] * len(users))
        occ_tail.extend([t] * len(users))
        occ_edge.extend([e_idx] * len(users))
        edge_tail.append(t)
        edge_head.append(h)
    return (np.asarray(occ_user, np.int32), np.asarray(occ_head, np.int32),
            np.asarray(occ_tail, np.int32), np.asarray(occ_edge, np.int32),
            np.asarray(edge_tail, np.int32), np.asarray(edge_head, np.int32))


class SGAT(CachedUserVecChunkMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = SGATConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_items, d = self.num_items, cfg.embed_size
        user_pos = self.dataset.train_data.to_user_dict_by_time()

        cache_dir = os.path.join(os.path.dirname(self.dataset.data_dir) or ".",
                                 "_sgat_data", self.dataset.data_name)
        os.makedirs(cache_dir, exist_ok=True)
        cache_file = os.path.join(cache_dir, "graph_elem.npz")
        if os.path.exists(cache_file):
            blob = np.load(cache_file)
            graph = tuple(blob[k] for k in ("occ_user", "occ_head", "occ_tail",
                                            "occ_edge", "edge_tail", "edge_head"))
        else:
            graph = _build_sgat_graph(user_pos, num_items)
            np.savez(cache_file, occ_user=graph[0], occ_head=graph[1],
                     occ_tail=graph[2], occ_edge=graph[3], edge_tail=graph[4],
                     edge_head=graph[5])
        (occ_user, occ_head, occ_tail, occ_edge, edge_tail, edge_head) = \
            tuple(jnp.asarray(g) for g in graph)
        n_edges = int(graph[4].shape[0])

        tn = lambda k, s: 0.01 * jax.random.truncated_normal(k, -2., 2., s)
        k_u, k_i = jax.random.split(jax.random.key(run_config.seed))
        self.params = {
            "user_emb": tn(k_u, (self.num_users, d)),
            "item_emb": tn(k_i, (num_items, d)),
            "item_bias": jnp.zeros((num_items,), jnp.float32),
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = SequentialPairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size, num_previous=cfg.n_seqs,
            num_next=cfg.n_next, pad=num_items, mesh=self.mesh)
        n_layers, n_next, reg = cfg.n_layers, cfg.n_next, cfg.reg
        pad_id = num_items

        from .common import mxu_msg_dtype, resolve_graph_impl
        impl = resolve_graph_impl(cfg.graph_impl, n_edges)
        if impl.startswith("mxu"):
            # the (E, D) attention-weighted aggregation runs through the MXU
            # scatter kernel with TRACED weights (attention is learned, so
            # the kernel's weight cotangent path is exercised here)
            from ..ops.pallas.segsum_mxu import (propagate_mxu_weighted,
                                                 weighted_mxu_graph_from_coo)
            g_items = weighted_mxu_graph_from_coo(
                graph[5], graph[4], num_items,
                msg_dtype=mxu_msg_dtype(impl))

            def aggregate(att, items):
                return propagate_mxu_weighted(g_items, items, att)
        else:
            def aggregate(att, items):
                return jax.ops.segment_sum(
                    att[:, None] * items[edge_head], edge_tail,
                    num_segments=num_items)

        def l2d(a, b):
            return jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12)

        def propagate_items(p):
            items = p["item_emb"]
            for _ in range(n_layers):
                h_e = items[occ_head] + p["user_emb"][occ_user]
                t_e = items[occ_tail]
                logit = -l2d(h_e, t_e)
                # mexp: global min-max normalization then exp (SGAT.py:63-72)
                norm = (logit - jnp.min(logit)) / (jnp.max(logit)
                                                   - jnp.min(logit) + 1e-12)
                exp_logit = jnp.exp(norm)
                edge_sum = jax.ops.segment_sum(exp_logit, occ_edge,
                                               num_segments=n_edges)
                row_sum = jax.ops.segment_sum(edge_sum, edge_tail,
                                              num_segments=num_items) + 1e-6
                att = edge_sum / row_sum[edge_tail]
                items = items + aggregate(att, items)
            return items

        self._propagate_items = jax.jit(propagate_items)

        def head_embedding(p, items_prop, head_seq):
            padded = jnp.concatenate([items_prop, jnp.zeros((1, d))], axis=0)
            seq_embs = padded[head_seq]                       # (B, L, D)
            mask = (head_seq != pad_id).astype(jnp.float32)
            his = jnp.sum(seq_embs, axis=1) \
                / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
            last = padded[head_seq[:, -1]]
            return last + his

        def loss_fn(p, batch):
            users, pos, neg, w, head_seq = batch   # pos/neg: (B, n_next)
            items_prop = propagate_items(p)
            user_e = p["user_emb"][users]
            head_e = head_embedding(p, items_prop, head_seq)
            pre = (head_e + user_e)[:, None, :]
            pos_e, neg_e = items_prop[pos], items_prop[neg]
            y_pos = -l2d(pre, pos_e) + p["item_bias"][pos]
            y_neg = -l2d(pre, neg_e) + p["item_bias"][neg]
            loss = jnp.sum(jnp.sum(
                -jax.nn.log_sigmoid(y_pos - y_neg), axis=1) * w)
            reg_term = 0.5 * jnp.sum((jnp.sum(user_e ** 2 + head_e ** 2, -1)
                                      + jnp.sum(pos_e ** 2 + neg_e ** 2, (1, 2))
                                      + jnp.sum(p["item_bias"][pos] ** 2
                                                + p["item_bias"][neg] ** 2, 1))
                                     * w)
            return loss + reg * reg_term

        self._finalize_setup_flat(run_config.seed, loss_fn)

        # test sequences: last n_seqs items, pre-padded (SGAT.py:91-96)
        from ..utils import pad_sequences
        seqs = [user_pos[u][-cfg.n_seqs:] if u in user_pos else [pad_id]
                for u in range(self.num_users)]
        self._test_seqs = jnp.asarray(pad_sequences(
            seqs, value=pad_id, max_len=cfg.n_seqs, padding="pre",
            truncating="pre"))

        @jax.jit
        def user_vec_fn(p, items_prop, users):
            user_e = p["user_emb"][users]
            head_e = head_embedding(p, items_prop, self._test_seqs[users])
            return head_e + user_e                          # (B, D)

        @jax.jit
        def predict_fn(p, items_prop, users):
            pre = user_vec_fn(p, items_prop, users)[:, None, :]
            dists = l2d(pre, items_prop[None, :, :])
            return -dists + p["item_bias"][None, :]

        from functools import partial

        @partial(jax.jit, static_argnames=("width",))
        def score_chunk_fn(p, items_prop, uv, lo, *, width):
            items = jax.lax.dynamic_slice_in_dim(items_prop, lo, width)
            bias = jax.lax.dynamic_slice_in_dim(p["item_bias"], lo, width)
            return -l2d(uv[:, None, :], items[None, :, :]) + bias[None, :]

        self._predict_fn = predict_fn
        self._user_vec_fn = user_vec_fn
        self._score_chunk_fn = score_chunk_fn
        self._final_items = None

    def evaluate(self, test_users=None):
        self._final_items = self._propagate_items(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final_items is None:
            self._final_items = self._propagate_items(self.params)
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._predict_fn(self.params, self._final_items, users)

    def _uv_state_refs(self) -> tuple:
        if self._final_items is None:
            self._final_items = self._propagate_items(self.params)
        return (self.params, self._final_items)

    def _user_vectors(self, users):
        return self._user_vec_fn(self.params, self._final_items, users)

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        return self._score_chunk_fn(self.params, self._final_items, uv,
                                    item_lo, width=item_hi - item_lo)

    def _topk_factors(self, uv):
        # score = -||uv - item|| + bias: not a dot, so predict_topk routes
        # through _topk_score_fn (the factors carry the operands)
        return uv, self._final_items, self.params["item_bias"]

    @staticmethod
    def _topk_score_fn(uv, items, bias):
        # expanded euclidean: never materializes (B, S, d) on a shard. Equal
        # to predict's l2d up to fp association (max(., 0) guards the
        # cancellation; +1e-12 matches l2d's epsilon).
        d2 = (jnp.sum(uv * uv, -1)[:, None] - 2.0 * (uv @ items.T)
              + jnp.sum(items * items, -1)[None, :])
        return -jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12) + bias[None, :]
