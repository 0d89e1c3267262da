"""DENS — disentangled negative sampling on graph CF.

Paper: Lai et al., "Disentangled Negative Sampling for Collaborative
Filtering" (WSDM 2023).

Behavioral parity with reference skrec/recommender/DENS.py:24-472:
LightGCN-style propagation keeping every hop's embedding [n, hops+1, d]
(optionally edge/message dropout); negative strategies over K groups of
n_negs candidates — ``rns`` (take first), ``dns`` (hardest by pooled score),
``dens`` (factor-gated hardest with linear user/item/pos/neg gates and
warmup-decayed raw term); softplus-sum BPR over K selected negatives; for
``dens`` the 4-term gated disentanglement loss weighted by gamma/4; L2 on
hop-0 embeddings / batch_size; Adam.

Init deviation (documented): gate Linear layers use xavier_uniform instead of
torch's default kaiming-uniform — within run-to-run variance.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import get_initializer
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig, normalize_adj_matrix
from .common import build_prop_graph, ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import PairwiseEpochPipeline

__all__ = ["DENS", "DENSConfig"]


class DENSConfig(ModelConfig):
    lr: float = 1e-3
    l2: float = 1e-4
    gamma: float = 0.3
    dim: int = 64
    batch_size: int = 2048
    context_hops: int = 3
    K: int = 1
    n_negs: int = 6
    ns: str = "dens"
    pool: str = "mean"
    warmup: int = 100
    mess_dropout: bool = False
    mess_dropout_rate: float = 0.1
    edge_dropout: bool = False
    edge_dropout_rate: float = 0.1
    alpha: float = 1.0
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    epochs: int = 1000
    early_stop: int = 100

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.l2, float) and self.l2 >= 0
        assert isinstance(self.gamma, float) and self.gamma >= 0
        assert isinstance(self.dim, int) and self.dim > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0
        assert isinstance(self.context_hops, int) and self.context_hops >= 0
        assert isinstance(self.K, int) and self.K > 0
        assert isinstance(self.n_negs, int) and self.n_negs > 0
        assert self.ns in {"rns", "dns", "dens"}
        assert self.pool in {"mean", "sum", "concat", "final"}
        assert isinstance(self.warmup, int) and self.warmup >= 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS


class DENS(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = DENSConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users = self.num_users

        pairs = self.dataset.train_data.to_user_item_pairs()
        n = self.num_users + self.num_items
        ones = np.ones(len(pairs), dtype=np.float32)
        upper = sp.csr_matrix((ones, (pairs[:, 0], pairs[:, 1] + num_users)),
                              shape=(n, n))
        adj = normalize_adj_matrix(upper + upper.T, "symmetric")
        graph = build_prop_graph(adj, cfg.graph_impl, mesh=self.mesh)

        init = get_initializer("xavier_uniform")
        keys = jax.random.split(jax.random.key(run_config.seed), 6)
        d = cfg.dim
        self.params = {
            "user_emb": init(keys[0], (self.num_users, d)),
            "item_emb": init(keys[1], (self.num_items, d)),
            "user_gate": {"w": init(keys[2], (d, d)), "b": jnp.zeros((d,))},
            "item_gate": {"w": init(keys[3], (d, d)), "b": jnp.zeros((d,))},
            "pos_gate": {"w": init(keys[4], (d, d)), "b": jnp.zeros((d,))},
            "neg_gate": {"w": init(keys[5], (d, d)), "b": jnp.zeros((d,))},
        }
        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = PairwiseEpochPipeline(
            self.dataset.train_data, cfg.batch_size,
            num_neg=cfg.K * cfg.n_negs, mesh=self.mesh)

        hops, K, n_negs, ns, pool = (cfg.context_hops, cfg.K, cfg.n_negs,
                                     cfg.ns, cfg.pool)
        gamma, l2, warmup, batch_size = cfg.gamma, cfg.l2, cfg.warmup, cfg.batch_size
        mess_do = cfg.mess_dropout_rate if cfg.mess_dropout else 0.0
        edge_do = cfg.edge_dropout_rate if cfg.edge_dropout else 0.0
        num_edges = adj.nnz

        def lin(gate, x):
            return x @ gate["w"] + gate["b"]

        def pooling(e):
            # e: (..., hops+1, d)
            if pool == "mean":
                return jnp.mean(e, axis=-2)
            if pool == "sum":
                return jnp.sum(e, axis=-2)
            if pool == "concat":
                return e.reshape(e.shape[:-2] + (-1,))
            return e[..., -1, :]

        def gcn(p, key=None):
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            embs = [ego]
            h = ego
            for _ in range(hops):
                edge_mask = None
                if key is not None and edge_do > 0:
                    key, sub = jax.random.split(key)
                    keep = jax.random.bernoulli(sub, 1 - edge_do, (num_edges,))
                    edge_mask = keep.astype(jnp.float32) / (1 - edge_do)
                h = propagate(graph, h, edge_mask)
                if key is not None and mess_do > 0:
                    key, sub = jax.random.split(key)
                    keep = jax.random.bernoulli(sub, 1 - mess_do, h.shape)
                    h = jnp.where(keep, h / (1 - mess_do), 0.0)
                embs.append(h)
            stacked = jnp.stack(embs, axis=1)  # (n, hops+1, d)
            return stacked[:num_users], stacked[num_users:]

        def select_negatives(p, s_e, p_e, n_e, anneal):
            """n_e: (B, n_negs, H, D) -> selected (B, H, D) per strategy."""
            if ns == "rns":
                return n_e[:, 0]
            if ns == "dns":
                s_pool = pooling(s_e)                       # (B, D)
                n_pool = pooling(n_e)                       # (B, n_negs, D)
                scores = jnp.sum(s_pool[:, None, :] * n_pool, -1)
                idx = jnp.argmax(scores, axis=1)
                return jnp.take_along_axis(
                    n_e, idx[:, None, None, None], axis=1)[:, 0]
            # dens
            gate_p = jax.nn.sigmoid(lin(p["item_gate"], p_e)
                                    + lin(p["user_gate"], s_e))
            gated_p = p_e * gate_p                          # (B, H, D)
            gate_n = jax.nn.sigmoid(lin(p["neg_gate"], n_e)
                                    + lin(p["pos_gate"], gated_p)[:, None])
            gated_n = n_e * gate_n
            n_sel = anneal * n_e - gated_n
            scores = jnp.sum(s_e[:, None] * n_sel, -1)      # (B, n_negs, H)
            idx = jnp.argmax(scores, axis=1)                # (B, H) per-hop pick
            idx = jax.lax.stop_gradient(idx)
            # gather per-hop winning candidate: (B, H, D)
            return jnp.take_along_axis(
                jnp.swapaxes(n_e, 1, 2), idx[:, :, None, None], axis=2)[:, :, 0]

        def loss_fn(p, batch, key, anneal):
            users, pos, neg, w_b = batch     # neg: (B, K*n_negs)
            u_all, i_all = gcn(p, key)
            s_e, p_e = u_all[users], i_all[pos]              # (B, H, D)
            neg_groups = neg.reshape(neg.shape[0], K, n_negs)
            sel = []
            for k in range(K):
                n_e = i_all[neg_groups[:, k]]                # (B, n_negs, H, D)
                sel.append(select_negatives(p, s_e, p_e, n_e, anneal))
            neg_sel = jnp.stack(sel, axis=1)                 # (B, K, H, D)

            u_pool = pooling(s_e)
            pos_pool = pooling(p_e)
            neg_pool = pooling(neg_sel)                      # (B, K, D)
            pos_scores = jnp.sum(u_pool * pos_pool, -1)
            neg_scores = jnp.sum(u_pool[:, None] * neg_pool, -1)  # (B, K)
            n_valid = jnp.maximum(jnp.sum(w_b), 1.0)
            mf_loss = jnp.sum(jnp.log(1 + jnp.sum(
                jnp.exp(neg_scores - pos_scores[:, None]), 1)) * w_b) / n_valid

            if ns == "dens" and gamma > 0:
                gate_pos = jax.nn.sigmoid(lin(p["item_gate"], p_e)
                                          + lin(p["user_gate"], s_e))
                g_pos_r = p_e * gate_pos
                g_pos_ir = p_e - g_pos_r
                gate_neg = jax.nn.sigmoid(
                    lin(p["neg_gate"], neg_sel)
                    + lin(p["pos_gate"], g_pos_r)[:, None])
                g_neg_r = neg_sel * gate_neg
                g_neg_ir = neg_sel - g_neg_r
                pr, nr = pooling(g_pos_r), pooling(g_neg_r)
                pir, nir = pooling(g_pos_ir), pooling(g_neg_ir)
                s_pr = jnp.sum(u_pool * pr, -1)
                s_nr = jnp.sum(u_pool[:, None] * nr, -1)
                s_pir = jnp.sum(u_pool * pir, -1)
                s_nir = jnp.sum(u_pool[:, None] * nir, -1)

                def mlog(x):  # weighted mean of log1p(exp sums)
                    return jnp.sum(x * w_b) / n_valid

                t1 = mlog(jnp.log(1 + jnp.exp(s_pir - s_pr)))
                t2 = mlog(jnp.log(1 + jnp.sum(jnp.exp(s_nr - s_nir), 1)))
                t3 = mlog(jnp.log(1 + jnp.sum(jnp.exp(s_nr - s_pr[:, None]), 1)))
                t4 = mlog(jnp.log(1 + jnp.sum(jnp.exp(s_pir[:, None] - s_nir), 1)))
                mf_loss += gamma * (t1 + t2 + t3 + t4) / 4

            # L2 on hop-0 embeddings (DENS.py:368-372)
            reg = (jnp.sum((s_e[:, 0] ** 2).sum(-1) * w_b)
                   + jnp.sum((p_e[:, 0] ** 2).sum(-1) * w_b)
                   + jnp.sum((neg_sel[:, :, 0] ** 2).sum(-1) * w_b[:, None])) / 2
            return mf_loss + l2 * reg / batch_size

        def train_step(carry, batch):
            params, opt_state, key, anneal = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub, anneal)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key, anneal), loss

        self._step_with_key = train_step
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)

        @jax.jit
        def embeddings_fn(p):
            u_all, i_all = gcn(p, None)
            return pooling(u_all), pooling(i_all)

        self._embeddings_fn = embeddings_fn
        self._final = None

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        # (1 - min(1, epoch/warmup)) scales the raw term (DENS.py:246)
        anneal = jnp.asarray(1.0 - min(1.0, epoch / max(self.config.warmup, 1)),
                             jnp.float32)
        # independent streams: the pipeline consumes k_epoch (shuffle /
        # negatives); the carry key drives in-step sampling. Sharing one key
        # would also alias a donated carry leaf with the non-donated epoch
        # key argument (f(a, donate(a)) — rejected by the runtime).
        k_epoch, k_carry = jax.random.split(key)
        carry = (self.params, self.opt_state, k_carry, anneal)
        (self.params, self.opt_state, _, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._step_with_key)
        return float(loss)

    def evaluate(self, test_users=None):
        self._final = self._embeddings_fn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final is None:
            self._final = self._embeddings_fn(self.params)
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_all[users] @ i_all.T

    def _chunk_embeddings(self):
        if self._final is None:
            self._final = self._embeddings_fn(self.params)
        return self._final
