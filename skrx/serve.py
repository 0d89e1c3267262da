"""Top-K recommendation serving.

No reference counterpart (skrec stops at offline evaluation). Wraps any
trained model's full-catalog ``predict`` into a jitted serving function that
masks already-seen training items and returns the top-K item ids + scores —
the online-inference contract of a production recommender. The ranking path
reuses the evaluator's on-device kernels (scatter -inf mask + exact top-k;
Pallas blockwise streaming for very large catalogs).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.metrics import topk_scores_and_indices

__all__ = ["TopKRecommender"]


class TopKRecommender:
    """Serve ``recommend(users) -> (item_ids, scores)``.

    Args:
        model: trained model exposing ``predict(users) -> (B, N) scores``
            and a ``dataset`` attribute (for the seen-item mask).
        k: recommendations per user.
        filter_seen: mask the user's training items (standard serving
            behavior; set False for rating-prediction style output).
    """

    # catalogs at/beyond this route dot-scoring models through the fused
    # score+select kernel (skrx/ops/pallas/dot_topk.py): `predict` would
    # materialize a (B, N) block — 4 GB at (1024, 1M) — where the fused
    # kernel recomputes score blocks on the MXU in VMEM and needs ~50 MB
    FUSED_MIN_ITEMS = 131072

    def __init__(self, model, k: int = 10, filter_seen: bool = True,
                 fused: str = "auto"):
        assert fused in ("auto", "always", "never")
        self.model = model
        self.k = k
        self.filter_seen = filter_seen
        train = model.dataset.train_data
        pp = train.to_padded_positive_table()
        self._seen = jnp.asarray(pp.table)  # (U, P), pad id = num_items

        @jax.jit
        def rank(scores, seen_rows):
            vals, idx = topk_scores_and_indices(
                scores, k, mask_table=seen_rows if filter_seen else None)
            return idx, vals

        self._rank = rank

        self._fused = None
        num_items = getattr(model, "num_items", 0)
        want = fused == "always" or (
            fused == "auto" and num_items >= self.FUSED_MIN_ITEMS
            and jax.default_backend() == "tpu")
        # models whose predict applies a score transform past the dot
        # (sigmoid/relu towers) advertise _topk_score_fn — the raw-dot
        # fused kernel would return logits and could re-order relu's
        # clamped ties, so they keep the predict+rank path (same gate the
        # evaluator applies)
        plain_dot = getattr(model, "_topk_score_fn", None) is None
        if want and plain_dot and hasattr(model, "_chunk_embeddings"):
            from .ops.pallas import dot_topk
            interpret = jax.default_backend() != "tpu"

            def fused_rank(uv, packed, n_items, seen_rows):
                vals, idx = dot_topk(
                    uv, None, None, k, interpret=interpret,
                    mask_table=seen_rows if filter_seen else None,
                    packed=packed, n=n_items)
                return idx, vals

            self._fused = fused_rank
            self._packed_cache = None  # (id-key refs, packed table)

    def recommend(self, users) -> Tuple[np.ndarray, np.ndarray]:
        users_np = np.asarray(users, dtype=np.int32)
        # JAX gathers CLAMP out-of-range ids — an unknown user would silently
        # receive the highest-id user's recommendations; fail loudly instead
        num_users = self._seen.shape[0]
        if users_np.size and (users_np.min() < 0
                              or users_np.max() >= num_users):
            raise ValueError(
                f"user ids must be in [0, {num_users}); got "
                f"[{users_np.min()}, {users_np.max()}]")
        users_arr = jnp.asarray(users_np)
        seen = self._seen[users_arr]
        if self._fused is not None:
            # huge-catalog dot models: fused score+select — the (B, N)
            # score matrix never exists (bit-identical ranking; tested).
            # The item table is transposed+padded ONCE per (items, bias)
            # identity, not inside every request (the in-call items.T cost
            # ~N*d*4 bytes of traffic + residency per request).
            from .ops.pallas.dot_topk import pack_items
            u_all, i_all = self.model._chunk_embeddings()
            bias = self.model._chunk_bias()
            cache = self._packed_cache
            if cache is None or cache[0] != (id(i_all), id(bias)):
                packed = pack_items(jnp.asarray(i_all, jnp.float32), bias)
                # hold refs so the ids can't be reused by new arrays
                self._packed_cache = ((id(i_all), id(bias)), packed,
                                      (i_all, bias))
            packed = self._packed_cache[1]
            idx, vals = self._fused(u_all[users_arr], packed,
                                    int(i_all.shape[0]), seen)
            return np.asarray(idx), np.asarray(vals)
        scores = jnp.asarray(self.model.predict(users_arr), jnp.float32)
        idx, vals = self._rank(scores, seen)
        return np.asarray(idx), np.asarray(vals)

    def export_stablehlo(self, batch_size: int) -> bytes:
        """AOT-export the ranking stage (scores -> top-K ids/values) as a
        serialized StableHLO artifact (`jax.export`) — deployable to a
        serving runtime without Python. The model's scoring stage is
        model-specific; this covers the shared mask+rank tail."""
        from jax import export as jexport

        n = int(jnp.asarray(
            self.model.predict(np.zeros(1, np.int32))).shape[1])
        scores_spec = jax.ShapeDtypeStruct((batch_size, n), jnp.float32)
        seen_spec = jax.ShapeDtypeStruct((batch_size, self._seen.shape[1]),
                                         jnp.int32)
        exported = jexport.export(self._rank)(scores_spec, seen_spec)
        return bytes(exported.serialize())
