"""BERT4Rec — bidirectional transformer with masked-item modeling.

Paper: Sun et al., "BERT4Rec: Sequential Recommendation with Bidirectional
Encoder Representations from Transformer" (CIKM 2019).

Behavioral parity with reference skrec/recommender/BERT4Rec/ (BERT4Rec.py:
25-187, modeling.py BertModel, bert4rec_gen_data.py, optimization.py:25-82):
sliding-window training instances (windows of max_seq_len stepped by
sliding_step); masked-LM objective with masked_lm_prob and up to
round(L*prob) predictions per instance, masked tokens replaced by [MASK];
post-LN transformer blocks (gelu, 4x intermediate), learned positional
embeddings, truncated-normal(init_range) init; masked-LM head = shared
embedding table + output bias; AdamW(weight decay 0.01, LayerNorm/bias
excluded) with 100-step linear warmup, linear decay, global-norm clip 5.0;
test instance = full history + [MASK] appended, scored at the last position.

TPU re-design (SURVEY §7.2): the reference's offline TFRecord generation
with dupe_factor pre-duplicated maskings + TF Estimator is replaced by
ON-DEVICE per-epoch random masking inside the jitted epoch scan — fresh
masks every epoch (what dupe_factor approximates), no disk artifacts.
"""
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.attention import dense, dropout, layer_norm
from ..run_config import RunConfig
from ..utils import ModelConfig
from .base import JaxRecommender
from .common import CachedUserVecChunkMixin
from .pipeline import pad_to_batches

__all__ = ["BERT4Rec", "BERT4RecConfig"]


class BERT4RecConfig(ModelConfig):
    max_seq_len: int = 5
    masked_lm_prob: float = 0.4
    sliding_step: int = 1
    dupe_factor: int = 10       # kept for config parity; superseded by
    #                             per-epoch on-device masking
    att_drop: float = 0.2
    h_drop: float = 0.5
    h_size: int = 64
    att_heads: int = 2
    init_range: float = 0.02
    h_act: str = "gelu"
    n_layers: int = 2
    lr: float = 1e-4
    batch_size: int = 256
    epochs: int = 3000
    early_stop: int = 80
    verbose: int = 10           # evaluate every `verbose` epochs
    # "bfloat16": transformer blocks in bf16 (f32 master weights + logits)
    compute_dtype: str = "float32"

    def _validate(self):
        assert isinstance(self.max_seq_len, int) and self.max_seq_len > 0
        assert 0 < self.masked_lm_prob < 1
        assert isinstance(self.sliding_step, int) and self.sliding_step > 0
        assert isinstance(self.h_size, int) and self.h_size > 0
        assert self.h_size % self.att_heads == 0
        assert isinstance(self.lr, float) and self.lr > 0
        assert isinstance(self.batch_size, int) and self.batch_size > 0


class BERT4Rec(CachedUserVecChunkMixin, JaxRecommender):
    def __init__(self, run_config: RunConfig, model_config: Dict):
        self.config = BERT4RecConfig(**model_config)
        super().__init__(run_config, self.config)
        cfg = self.config
        self.num_users = self.dataset.num_users
        self.num_items = self.dataset.num_items
        num_items = self.num_items
        mask_id = num_items
        pad_id = num_items + 1
        vocab = num_items + 2
        L, d = cfg.max_seq_len, cfg.h_size

        # sliding-window training instances (gen_data:161-176)
        user_pos = self.dataset.train_data.to_user_dict_by_time()
        windows = []
        for u, seq in user_pos.items():
            if len(seq) <= L:
                windows.append(seq)
            else:
                begs = list(range(len(seq) - L, 0, -cfg.sliding_step)) + [0]
                for b in begs:
                    windows.append(seq[b: b + L])
        win_arr = np.full((len(windows), L), pad_id, dtype=np.int32)
        for i, w in enumerate(windows):
            win_arr[i, : len(w)] = w[:L]
        win_p, weights = pad_to_batches(win_arr, cfg.batch_size)
        self._windows = jnp.asarray(win_p)
        self._w = jnp.asarray(weights)
        nb = len(win_p) // cfg.batch_size
        self._nb = nb

        max_preds = max(int(round(L * cfg.masked_lm_prob)), 1)

        tn = lambda k, s: cfg.init_range * jax.random.truncated_normal(
            k, -2.0, 2.0, s)
        keys = jax.random.split(jax.random.key(run_config.seed),
                                4 + cfg.n_layers)
        blocks = []
        for i in range(cfg.n_layers):
            bk = jax.random.split(keys[4 + i], 8)
            blocks.append({
                "q": {"w": tn(bk[0], (d, d)), "b": jnp.zeros((d,))},
                "k": {"w": tn(bk[1], (d, d)), "b": jnp.zeros((d,))},
                "v": {"w": tn(bk[2], (d, d)), "b": jnp.zeros((d,))},
                "att_out": {"w": tn(bk[3], (d, d)), "b": jnp.zeros((d,))},
                "ln1_s": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
                "ff1": {"w": tn(bk[4], (d, 4 * d)), "b": jnp.zeros((4 * d,))},
                "ff2": {"w": tn(bk[5], (4 * d, d)), "b": jnp.zeros((d,))},
                "ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
            })
        self.params = {
            "tok_emb": tn(keys[0], (vocab, d)),
            "pos_emb": tn(keys[1], (L, d)),
            "ln_e_s": jnp.ones((d,)), "ln_e_b": jnp.zeros((d,)),
            "mlm_dense": {"w": tn(keys[2], (d, d)), "b": jnp.zeros((d,))},
            "mlm_ln_s": jnp.ones((d,)), "mlm_ln_b": jnp.zeros((d,)),
            "out_bias": jnp.zeros((vocab,)),
            "blocks": blocks,
        }

        num_train_steps = max(nb * cfg.epochs, 1)
        # 100-step linear warmup then linear decay (optimization.py:25-82)
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, 100),
             optax.linear_schedule(cfg.lr, 0.0, max(num_train_steps - 100, 1))],
            [100])

        def decay_mask(params):
            # reference optimization.py excludes ONLY LayerNorm and bias
            # leaves from weight decay — embeddings DO decay; match the
            # exclusion on the exact leaf key, not a substring (a suffix
            # test like "b']" silently exempted tok_emb/pos_emb)
            def mask_fn(path, x):
                name = "/".join(str(p) for p in path)
                leaf = str(path[-1])
                is_bias = leaf in ("['b']", "['bias']") or "bias" in leaf
                return not ("ln" in name or is_bias)
            return jax.tree_util.tree_map_with_path(mask_fn, params)

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(5.0),
            optax.adamw(schedule, b2=0.999, eps=1e-6, weight_decay=0.01,
                        mask=decay_mask))
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_config.seed + 1)

        heads, att_drop, h_drop = cfg.att_heads, cfg.att_drop, cfg.h_drop
        act = jax.nn.gelu if cfg.h_act == "gelu" else jax.nn.relu
        compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                         else jnp.float32)

        def encode(p, tokens, rng=None):
            if compute_dtype != jnp.float32:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if a.dtype == jnp.float32 else a, p)
            b, t = tokens.shape
            x = p["tok_emb"][tokens] + p["pos_emb"][None, :t, :]
            x = layer_norm(x, p["ln_e_s"], p["ln_e_b"])
            if rng is not None:
                rng, sub = jax.random.split(rng)
                x = dropout(sub, x, h_drop)
            attn_mask = (tokens != pad_id)
            for blk in p["blocks"]:
                k1 = k2 = k3 = None
                if rng is not None:
                    rng, k1, k2, k3 = jax.random.split(rng, 4)
                hd = d // heads
                q = dense(x, blk["q"]).reshape(b, t, heads, hd)
                k = dense(x, blk["k"]).reshape(b, t, heads, hd)
                v = dense(x, blk["v"]).reshape(b, t, heads, hd)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
                logits = jnp.where(attn_mask[:, None, None, :], logits, -1e9)
                probs = jax.nn.softmax(logits, axis=-1)
                probs = dropout(k1, probs, att_drop)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
                ctx = dense(ctx, blk["att_out"])
                ctx = dropout(k2, ctx, h_drop)
                x = layer_norm(x + ctx, blk["ln1_s"], blk["ln1_b"])
                ff = dense(act(dense(x, blk["ff1"])), blk["ff2"])
                ff = dropout(k3, ff, h_drop)
                x = layer_norm(x + ff, blk["ln2_s"], blk["ln2_b"])
            return x.astype(jnp.float32)

        def mlm_logits(p, hidden):
            h = act(dense(hidden, p["mlm_dense"]))
            h = layer_norm(h, p["mlm_ln_s"], p["mlm_ln_b"])
            return h @ p["tok_emb"].T + p["out_bias"]

        def loss_fn(p, batch, rng):
            tokens, w = batch
            rng, k_mask, k_enc = jax.random.split(rng, 3)
            real = tokens != pad_id
            # pick up to max_preds masked positions per row: random scores,
            # top max_preds among real positions with prob masked_lm_prob
            scores = jax.random.uniform(k_mask, tokens.shape)
            do_mask = (scores < cfg.masked_lm_prob) & real
            # cap at max_preds via top-k of scores among selected
            sel_scores = jnp.where(do_mask, -scores, jnp.inf)
            kth = jnp.sort(sel_scores, axis=1)[:, max_preds - 1: max_preds]
            do_mask = do_mask & (sel_scores <= kth)
            # ensure at least one mask per real row: force-mask last real pos
            any_mask = jnp.any(do_mask, axis=1)
            last_real = jnp.maximum(jnp.sum(real, axis=1) - 1, 0)
            force = jax.nn.one_hot(last_real, tokens.shape[1], dtype=bool) \
                & real & ~any_mask[:, None]
            do_mask = do_mask | force

            inp = jnp.where(do_mask, mask_id, tokens)
            hidden = encode(p, inp, k_enc)
            logits = mlm_logits(p, hidden)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            tgt_lp = jnp.take_along_axis(log_probs, tokens[..., None],
                                         axis=-1)[..., 0]
            weight = do_mask.astype(jnp.float32) * w[:, None]
            return -jnp.sum(tgt_lp * weight) / jnp.maximum(jnp.sum(weight), 1.0)

        def train_step(carry, batch):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        bsz = cfg.batch_size
        mesh = self.mesh

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, windows, w, key):
            from .pipeline import _shard_batches
            k_perm, k_steps = jax.random.split(key)
            perm = jax.random.permutation(k_perm, windows.shape[0])
            windows, w = windows[perm], w[perm]
            batches = _shard_batches(
                mesh, (windows.reshape(nb, bsz, L), w.reshape(nb, bsz)))
            (params, opt_state, _), losses = jax.lax.scan(
                train_step, (params, opt_state, k_steps), batches)
            return params, opt_state, jnp.mean(losses)

        self._run_epoch = run_epoch

        # test instances (force-last, gen_data:421-508): the reference's
        # test document is (train + test) with the LAST token masked, so for
        # fold-out users earlier TEST items are visible context — a reference
        # quirk kept for parity (leave-one-out users are unaffected)
        test_pos = self.dataset.test_data.to_user_dict_by_time()
        test_tokens = np.full((self.num_users, L), pad_id, dtype=np.int32)
        mask_pos = np.zeros(self.num_users, dtype=np.int32)
        for u in range(self.num_users):
            tr = user_pos.get(u, np.array([], dtype=np.int32))
            te = test_pos.get(u, np.array([], dtype=np.int32))
            doc = np.concatenate([tr, te]).astype(np.int32)
            hist = doc[:-1][-(L - 1):] if L > 1 and len(doc) else doc[:0]
            test_tokens[u, : len(hist)] = hist
            test_tokens[u, len(hist)] = mask_id
            mask_pos[u] = len(hist)
        self._test_tokens = jnp.asarray(test_tokens)
        self._test_mask_pos = jnp.asarray(mask_pos)

        @jax.jit
        def user_vec_fn(p, users):
            tokens = self._test_tokens[users]
            hidden = encode(p, tokens, None)
            pos = self._test_mask_pos[users]
            h = jnp.take_along_axis(
                hidden, pos[:, None, None].repeat(d, axis=2), axis=1)[:, 0]
            # transformed MLM head input: score vs token table is a plain dot
            h = act(dense(h, p["mlm_dense"]))
            return layer_norm(h, p["mlm_ln_s"], p["mlm_ln_b"])

        @jax.jit
        def predict_fn(p, users):
            logits = user_vec_fn(p, users) @ p["tok_emb"].T + p["out_bias"]
            return logits[:, :num_items]  # scores over real items only

        @partial(jax.jit, static_argnames=("width",))
        def score_chunk_fn(p, uv, lo, *, width):
            # item id == token id for real items; chunks stay < num_items so
            # the mask/pad special tokens are never scored
            tbl = jax.lax.dynamic_slice_in_dim(p["tok_emb"], lo, width)
            bias = jax.lax.dynamic_slice_in_dim(p["out_bias"], lo, width)
            return uv @ tbl.T + bias[None, :]

        self._predict_fn = predict_fn
        self._user_vec_fn = user_vec_fn
        self._score_chunk_fn = score_chunk_fn

    def _train_epoch(self, epoch: int) -> float:
        key = jax.random.fold_in(self._rng, epoch)
        self.params, self.opt_state, loss = self._run_epoch(
            self.params, self.opt_state, self._windows, self._w, key)
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
        # predict == uv @ tok_emb[:N].T + out_bias[:N] (token id == item id
        # for real items; mask/pad special tokens excluded)
        n = self.num_items
        return uv, self.params["tok_emb"][:n], self.params["out_bias"][:n]
