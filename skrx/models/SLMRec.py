"""SLMRec — self-supervised learning for multimedia recommendation.

Paper: Tao et al., "Self-supervised Learning for Multimedia Recommendation"
(IEEE TMM 2022).

Behavioral parity with reference skrec/recommender/SLMRec.py:24-583:
per-modality LightGCN towers (id / projected-visual / projected-text item
inputs, shared user embedding) over the adj_type-normalized graph; fusion by
concat or mean + linear after-GCN projections; main loss = in-batch InfoNCE
between normalized user/pos-item embeddings at temperature ``temp``; SSL
tasks weighted by ssl_alpha — FAC (hierarchical projection InfoNCE between
the id tower and modality towers), FD (per-layer message-dropout twin
branches, crossed), FM (random modality zero-masking twin branches), FD+FM;
Adam; predict = sigmoid(U @ I^T).

Deviations (documented): the reference's audio tower is dead code (skrec
datasets carry no ``.audio.npz`` and the FD/FM paths would crash with it);
towers here are id/v/t, and FM draws its two masked branches from
{v, t, id} instead of a 4-way range including the absent audio.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import get_initializer, torch_layer_default
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig
from .common import (build_prop_graph, ChunkedDotPredictMixin,
                     EpochTrainedRecommender)
from .pipeline import InteractionEpochPipeline

__all__ = ["SLMRec", "SLMRecConfig"]


class SLMRecConfig(ModelConfig):
    lr: float = 1e-4
    reg: float = 1e-4
    rec_dim: int = 64
    layer_num: int = 3
    ssl_alpha: float = 0.01
    ssl_temp: float = 0.1
    dropout_rate: float = 0.3
    temp: float = 0.2
    mm_fusion_mode: str = "concat"   # concat | mean
    adj_type: str = "pre"
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    ssl_task: str = "FAC"            # FAC | FD | FM | FD+FM
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"lr": [0.0001, 0.001, 0.01, 0.1],
                "ssl_temp": [0.1, 0.2, 0.5, 1.0],
                "ssl_alpha": [0.01, 0.05, 0.1, 0.5, 1.0],
                "reg": [0.0001, 0.001, 0.01, 0.1]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert self.mm_fusion_mode in {"concat", "mean"}
        assert self.ssl_task in {"FAC", "FD", "FM", "FD+FM"}
        assert self.adj_type in {"plain", "norm", "gcmc", "pre", "mean"}
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


def _slmrec_adj(pairs, num_users, num_items, adj_type):
    n = num_users + num_items
    ones = np.ones(len(pairs), dtype=np.float32)
    upper = sp.csr_matrix((ones, (pairs[:, 0], pairs[:, 1] + num_users)),
                          shape=(n, n))
    adj = upper + upper.T

    def left_norm(a):
        deg = np.asarray(a.sum(axis=1)).flatten()
        with np.errstate(divide="ignore"):
            d_inv = np.power(deg, -1.0)
        d_inv[np.isinf(d_inv)] = 0.0
        return sp.diags(d_inv) @ a

    if adj_type == "plain":
        return adj
    if adj_type == "norm":
        return left_norm(adj + sp.eye(n))
    if adj_type == "gcmc":
        return left_norm(adj)
    if adj_type == "pre":
        deg = np.asarray(adj.sum(axis=1)).flatten() + 1e-8
        d_inv = np.power(deg, -0.5)
        d_inv[np.isinf(d_inv)] = 0.0
        d = sp.diags(d_inv)
        return d @ adj @ d
    return left_norm(adj) + sp.eye(n)


class SLMRec(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = SLMRecConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users, num_items = self.num_users, self.num_items

        v_feat = self.dataset.img_features
        t_feat = self.dataset.txt_features
        assert v_feat is not None and t_feat is not None, \
            "SLMRec requires image and text features"

        def l2n(x):
            return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)

        self._v_feat = jnp.asarray(l2n(v_feat.astype(np.float32)))
        self._t_feat = jnp.asarray(l2n(t_feat.astype(np.float32)))

        graph = build_prop_graph(_slmrec_adj(
            self.dataset.train_data.to_user_item_pairs(), num_users,
            num_items, cfg.adj_type), cfg.graph_impl, mesh=self.mesh)

        xavier = get_initializer("xavier_uniform")
        glorot = jax.nn.initializers.glorot_uniform()
        keys = jax.random.split(jax.random.key(run_config.seed), 14)
        d = cfg.rec_dim
        n_modal = 2  # v, t
        fused_dim = d * (n_modal + 1) if cfg.mm_fusion_mode == "concat" else d

        def lin(key, d_in, d_out):
            # reference re-inits only the WEIGHT to xavier (SLMRec.py:114-119,
            # 482-486); biases keep torch's default U(+-1/sqrt(fan_in))
            kw, kb = jax.random.split(key)
            return {"w": glorot(kw, (d_in, d_out)),
                    "b": torch_layer_default(kb, (d_out,), d_in)}

        self.params = {
            "user_emb": xavier(keys[0], (num_users, d)),
            "item_emb": xavier(keys[1], (num_items, d)),
            "v_dense": lin(keys[2], v_feat.shape[1], d),
            "t_dense": lin(keys[3], t_feat.shape[1], d),
            "after_gcn_u": lin(keys[4], fused_dim, d),
            "after_gcn_i": lin(keys[5], fused_dim, d),
        }
        if cfg.ssl_task == "FAC":
            self.params.update({
                "g_i_iv": lin(keys[6], d, d),
                "g_v_iv": lin(keys[7], d, d),
                "g_iv_iva": lin(keys[8], d, d),
                "g_iva_ivat": lin(keys[9], d, d // 2),
                "g_t_ivat": lin(keys[10], d, d // 2),
            })

        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = InteractionEpochPipeline(self.dataset.train_data,
                                                 cfg.batch_size, mesh=self.mesh)
        n_layers, temp, ssl_temp = cfg.layer_num, cfg.temp, cfg.ssl_temp
        ssl_alpha, ssl_task = cfg.ssl_alpha, cfg.ssl_task
        drop_rate = cfg.dropout_rate
        fusion = cfg.mm_fusion_mode
        v_feat_j, t_feat_j = self._v_feat, self._t_feat

        def apply_lin(p, x):
            return x @ p["w"] + p["b"]

        def gcn(u_emb, i_emb, key=None, mask_items=False):
            if mask_items:
                i_emb = jnp.zeros_like(i_emb)
            x = jnp.concatenate([u_emb, i_emb], axis=0)
            layers = [x]
            for _ in range(n_layers):
                x = propagate(graph, x)
                if key is not None and drop_rate > 0:
                    key, sub = jax.random.split(key)
                    keep = jax.random.bernoulli(sub, 1 - drop_rate, x.shape)
                    x = jnp.where(keep, x / (1 - drop_rate), 0.0)
                layers.append(x)
            return jnp.mean(jnp.stack(layers, axis=1), axis=1)

        def mm_fusion(reps):
            if fusion == "concat":
                return jnp.concatenate(reps, axis=1)
            return jnp.mean(jnp.stack(reps), axis=0)

        def towers(p):
            """Per-modality GCN outputs (eval mode — the FD/FM dropout and
            masking variants live in twin_branch_loss's branch())."""
            v_dense = apply_lin(p["v_dense"], v_feat_j)
            t_dense = apply_lin(p["t_dense"], t_feat_j)
            i_out = gcn(p["user_emb"], p["item_emb"], None)
            v_out = gcn(p["user_emb"], v_dense, None)
            t_out = gcn(p["user_emb"], t_dense, None)
            return i_out, v_out, t_out

        def fuse(p, i_out, v_out, t_out):
            u = apply_lin(p["after_gcn_u"], mm_fusion(
                [i_out[:num_users], v_out[:num_users], t_out[:num_users]]))
            i = apply_lin(p["after_gcn_i"], mm_fusion(
                [i_out[num_users:], v_out[num_users:], t_out[num_users:]]))
            return u, i

        def compute(p):
            i_out, v_out, t_out = towers(p)
            return fuse(p, i_out, v_out, t_out), (i_out, v_out, t_out)

        self._compute = jax.jit(lambda p: compute(p)[0])

        def ce_diag(logits, w):
            """Weighted in-batch cross-entropy with diagonal labels.

            Zero-weight PADDING rows are removed from the denominator too
            (log(0) = -inf column mask): they are duplicates of one epoch
            example and would otherwise act as systematic extra negatives in
            every softmax — the reference's last batch is simply smaller."""
            logits = logits + jnp.log(jnp.maximum(w, 1e-38))[None, :]
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            n_valid = jnp.maximum(jnp.sum(w), 1.0)
            # pad rows' own diagonal is -inf (their column is masked);
            # select before weighting or 0 * -inf = NaN
            diag = jnp.where(w > 0, jnp.diagonal(log_probs), 0.0)
            return -jnp.sum(diag * w) / n_valid

        def norm_rows(x):
            return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)

        def fac_loss(p, towers_out, items, w):
            i_out, v_out, t_out = towers_out
            i_emb_i = i_out[num_users:][items]
            v_emb_i = v_out[num_users:][items]
            t_emb_i = t_out[num_users:][items]
            x_i_iv = apply_lin(p["g_i_iv"], i_emb_i)
            x_v_iv = apply_lin(p["g_v_iv"], v_emb_i)
            v_loss = ce_diag(x_i_iv @ x_v_iv.T / ssl_temp, w)
            x_iv_iva = apply_lin(p["g_iv_iva"], x_i_iv)
            x_iva_ivat = apply_lin(p["g_iva_ivat"], x_iv_iva)
            x_t_ivat = apply_lin(p["g_t_ivat"], t_emb_i)
            t_loss = ce_diag(x_iva_ivat @ x_t_ivat.T / ssl_temp, w)
            return v_loss + t_loss

        def twin_branch_loss(p, users, items, w, key, use_dropout, use_mask):
            k1, k2, km = jax.random.split(key, 3)
            if use_mask:
                # two distinct masked towers; traced indices are turned into
                # one-hot float masks so the graph shape stays static
                idx1 = jax.random.randint(km, (), 0, 3)
                idx2 = jnp.mod(idx1 + 1 + jax.random.randint(
                    jax.random.fold_in(km, 1), (), 0, 2), 3)

            def branch(p, key, mask_sel):
                v_dense = apply_lin(p["v_dense"], v_feat_j)
                t_dense = apply_lin(p["t_dense"], t_feat_j)
                ks = jax.random.split(key, 3) if use_dropout else [None] * 3

                def tower(i_emb, k, sel):
                    i_in = i_emb * (1.0 - sel) if sel is not None else i_emb
                    return gcn(p["user_emb"], i_in, k)

                sels = (None, None, None) if mask_sel is None else mask_sel
                i_out = tower(p["item_emb"], ks[0] if use_dropout else None,
                              sels[2])
                v_out = tower(v_dense, ks[1] if use_dropout else None, sels[0])
                t_out = tower(t_dense, ks[2] if use_dropout else None, sels[1])
                return fuse(p, i_out, v_out, t_out)

            if use_mask:
                sel1 = tuple(jnp.asarray((idx1 == i).astype(jnp.float32))
                             for i in range(3))
                sel2 = tuple(jnp.asarray((idx2 == i).astype(jnp.float32))
                             for i in range(3))
            else:
                sel1 = sel2 = None
            u1, i1 = branch(p, k1, sel1)
            u2, i2 = branch(p, k2, sel2)
            u1, u2 = norm_rows(u1[users]), norm_rows(u2[users])
            i1, i2 = norm_rows(i1[items]), norm_rows(i2[items])
            return (ce_diag(u1 @ u2.T / ssl_temp, w)
                    + ce_diag(i1 @ i2.T / ssl_temp, w))

        def loss_fn(p, batch, key):
            users, items, w = batch
            (u_all, i_all), towers_out = compute(p)
            u_b = norm_rows(u_all[users])
            i_b = norm_rows(i_all[items])
            main = ce_diag(u_b @ i_b.T / temp, w)
            if ssl_task == "FAC":
                ssl = fac_loss(p, towers_out, items, w)
            elif ssl_task == "FD":
                ssl = twin_branch_loss(p, users, items, w, key, True, False)
            elif ssl_task == "FM":
                ssl = twin_branch_loss(p, users, items, w, key, False, True)
            else:  # FD+FM
                ssl = twin_branch_loss(p, users, items, w, key, True, True)
            return main + ssl_alpha * ssl

        def train_step(carry, batch):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        self._step_with_key = train_step
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)
        self._final = None

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        # independent streams: the pipeline consumes k_epoch (shuffle /
        # negatives); the carry key drives in-step dropout — sharing one key
        # correlates batch-0 dropout with the sampling stream
        k_epoch, k_carry = jax.random.split(key)
        carry = (self.params, self.opt_state, k_carry)
        (self.params, self.opt_state, _), loss = self.pipeline.run_epoch(
            k_epoch, carry, self._step_with_key)
        return float(loss)

    def evaluate(self, test_users=None):
        self._final = self._compute(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        if self._final is None:
            self._final = self._compute(self.params)
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return jax.nn.sigmoid(u_all[users] @ i_all.T)

    def predict_chunk(self, users, item_lo: int, item_hi: int) -> jnp.ndarray:
        if self._final is None:
            self._final = self._compute(self.params)
        u_all, i_all = self._final
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return jax.nn.sigmoid(u_all[users] @ i_all[item_lo:item_hi].T)

    # TP eval (round 4): sigmoid is strictly monotone but changes VALUES,
    # so predict_topk routes a custom _topk_score_fn (applied inside each
    # catalog shard); fused dot_topk stays disabled (no score hook).
    def _chunk_embeddings(self):
        if self._final is None:
            self._final = self._compute(self.params)
        return self._final

    @staticmethod
    def _topk_score_fn(uv, items, bias):
        return jax.nn.sigmoid(uv @ items.T + bias[None, :])
