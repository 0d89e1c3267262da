"""BM3 — bootstrapped multimodal model (BYOL-style, no negatives).

Paper: Zhou et al., "Bootstrap Latent Representations for Multi-modal
Recommendation" (WWW 2023).

Behavioral parity with reference skrec/recommender/BM3.py:24-260: LightGCN
forward over the eps-normalized bipartite graph with residual item-id
embedding (i_g + h); trainable modality feature tables + linear projectors;
BYOL: dropout-perturbed detached targets, shared linear predictor,
1-cosine losses for ui/iu and modality-to-item / modality-to-modality pairs;
reg = (||U||+||I||)/n_items; Adam.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import get_initializer
from ..ops.graph import propagate
from ..run_config import RunConfig
from ..utils import ModelConfig
from .SelfCF import _norm_adj_eps
from .common import build_prop_graph, ChunkedDotPredictMixin, EpochTrainedRecommender
from .pipeline import InteractionEpochPipeline

__all__ = ["BM3", "BM3Config"]


class BM3Config(ModelConfig):
    lr: float = 1e-3
    reg: float = 0.1
    embed_dim: int = 64
    # NOTE: the reference BM3 hardcodes feat_embed_dim = embed_dim
    # (BM3.py:79), so this field is accepted but — like the reference —
    # has no effect on the projector width (kept for config parity)
    feat_dim: int = 64
    n_layers: int = 1
    dropout: float = 0.3
    cl_weight: float = 2.0
    graph_impl: str = "auto"  # auto | segment | mxu (see models/common.py)
    batch_size: int = 2048
    epochs: int = 1000
    early_stop: int = 200

    @classmethod
    def param_space(cls):
        return {"n_layers": [1, 2], "reg": [0.1, 0.01],
                "dropout": [0.3, 0.5]}

    def _validate(self):
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.reg, float) and self.reg >= 0
        assert isinstance(self.embed_dim, int) and self.embed_dim > 0
        assert isinstance(self.n_layers, int) and self.n_layers > 0
        assert isinstance(self.dropout, float) and 0 <= self.dropout < 1
        assert isinstance(self.cl_weight, float) and self.cl_weight >= 0
        from .common import GRAPH_IMPLS
        assert self.graph_impl in GRAPH_IMPLS
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class BM3(ChunkedDotPredictMixin, EpochTrainedRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = BM3Config(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_users = self.num_users

        v_feat = self.dataset.img_features
        t_feat = self.dataset.txt_features
        graph = build_prop_graph(_norm_adj_eps(
            self.dataset.train_data.to_user_item_pairs(), num_users,
            self.num_items), cfg.graph_impl, mesh=self.mesh)

        xavier_u = get_initializer("xavier_uniform")
        xavier_n = get_initializer("xavier_normal")
        keys = jax.random.split(jax.random.key(run_config.seed), 6)
        d = cfg.embed_dim
        self.params = {
            "user_emb": xavier_u(keys[0], (num_users, d)),
            "item_emb": xavier_u(keys[1], (self.num_items, d)),
            "pred_w": xavier_n(keys[2], (d, d)), "pred_b": jnp.zeros((d,)),
        }
        # modality features are TRAINABLE tables (from_pretrained freeze=False)
        if v_feat is not None:
            self.params["v_feat"] = jnp.asarray(v_feat.astype(np.float32))
            self.params["image_trs"] = {
                "w": xavier_n(keys[3], (v_feat.shape[1], d)),
                "b": jnp.zeros((d,))}
        if t_feat is not None:
            self.params["t_feat"] = jnp.asarray(t_feat.astype(np.float32))
            self.params["text_trs"] = {
                "w": xavier_n(keys[4], (t_feat.shape[1], d)),
                "b": jnp.zeros((d,))}
        has_v, has_t = v_feat is not None, t_feat is not None

        self.optimizer = optax.adam(cfg.lr)
        self.pipeline = InteractionEpochPipeline(self.dataset.train_data,
                                                 cfg.batch_size, mesh=self.mesh)
        n_layers, dropout = cfg.n_layers, cfg.dropout
        reg_w, cl_w = cfg.reg, cfg.cl_weight

        def forward(p):
            h = p["item_emb"]
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], axis=0)
            layers = [ego]
            x = ego
            for _ in range(n_layers):
                x = propagate(graph, x)
                layers.append(x)
            combined = jnp.mean(jnp.stack(layers, axis=1), axis=1)
            return combined[:num_users], combined[num_users:] + h

        def predictor(p, x):
            return x @ p["pred_w"] + p["pred_b"]

        def drop_target(key, x):
            x = jax.lax.stop_gradient(x)
            if dropout > 0:
                keep = jax.random.bernoulli(key, 1 - dropout, x.shape)
                x = jnp.where(keep, x / (1 - dropout), 0.0)
            return x

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
            return jnp.sum(a * b, -1)

        def loss_fn(p, batch, key):
            users, items, w = batch
            keys = jax.random.split(key, 4)
            u_ori, i_ori = forward(p)
            u_tgt = drop_target(keys[0], u_ori)[users]
            i_tgt = drop_target(keys[1], i_ori)[items]
            u_on = predictor(p, u_ori)[users]
            i_on = predictor(p, i_ori)[items]
            n_valid = jnp.maximum(jnp.sum(w), 1.0)

            def wmean(x):
                return jnp.sum(x * w) / n_valid

            loss = wmean(1 - cos(u_on, i_tgt)) + wmean(1 - cos(i_on, u_tgt))
            cl = 0.0
            if has_t:
                t_online = p["t_feat"] @ p["text_trs"]["w"] + p["text_trs"]["b"]
                t_tgt = drop_target(keys[2], t_online)[items]
                t_on = predictor(p, t_online)[items]
                cl += wmean(1 - cos(t_on, i_tgt)) + wmean(1 - cos(t_on, t_tgt))
            if has_v:
                v_online = p["v_feat"] @ p["image_trs"]["w"] + p["image_trs"]["b"]
                v_tgt = drop_target(keys[3], v_online)[items]
                v_on = predictor(p, v_online)[items]
                cl += wmean(1 - cos(v_on, i_tgt)) + wmean(1 - cos(v_on, v_tgt))

            reg = (jnp.linalg.norm(u_ori) + jnp.linalg.norm(i_ori)) \
                / i_ori.shape[0]
            return loss + reg_w * reg + cl_w * cl

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

        @jax.jit
        def embeddings_fn(p):
            u_ori, i_ori = forward(p)
            return predictor(p, u_ori), predictor(p, i_ori)

        self._embeddings_fn = embeddings_fn

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
        self._final = self._embeddings_fn(self.params)
        return super().evaluate(test_users)

    def predict(self, users) -> jnp.ndarray:
        u_on, i_on = self._chunk_embeddings()
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return u_on[users] @ i_on.T

    def _chunk_embeddings(self):
        # cached per evaluation (invalidated after every training epoch by
        # the fit harness); predict_chunk would otherwise re-run the full
        # graph forward per (user batch x item chunk)
        if getattr(self, "_final", None) is None:
            self._final = self._embeddings_fn(self.params)
        return self._final
