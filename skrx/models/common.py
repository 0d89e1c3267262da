"""Shared plumbing for JAX models: optimizer step factory and a base class
that wires params/opt_state/pipeline into the epoch harness.

This factors out what every reference model re-implements inline
(the zero_grad/backward/step loop, e.g. BPRMF.py:125-127) into one
train-step builder used by the whole zoo.
"""
from typing import Callable, Optional

import jax
import numpy as np
import optax

from .base import JaxRecommender

__all__ = ["make_train_step", "make_sharded_train_step",
           "EpochTrainedRecommender", "adam_l2",
           "ChunkedDotPredictMixin", "CachedUserVecChunkMixin",
           "build_prop_graph", "GRAPH_IMPLS", "resolve_graph_impl",
           "mxu_msg_dtype", "graph_sharding_enabled",
           "graph_param_shardings"]

GRAPH_IMPLS = ("auto", "segment", "mxu", "mxu_bf16")

# Below this edge count the XLA scatter is already fast and the Pallas
# compile time dominates, so 'auto' keeps the segment path.
_MXU_MIN_EDGES = 200_000


def resolve_graph_impl(graph_impl: str, num_edges: int) -> str:
    """Resolve 'auto' to a concrete propagation implementation.

    'mxu_bf16' (Pallas MXU scatter kernel with bfloat16 edge messages,
    3.2x end-to-end vs the XLA segment-sum at Gowalla scale —
    skrx/ops/pallas/segsum_mxu.py) on TPU for graphs big enough that the
    scatter dominates; 'segment' (XLA sorted segment-sum) elsewhere (small
    graphs, and CPU where the interpret-mode Pallas fallback is slow).

    bf16 messages round the propagated features at ~1e-3 relative — shown
    quality-neutral for LightGCN/LayerGCN/DENS (best-epoch NDCG@10 and
    Recall@10 within 0.6% of the f32 run on the same loop/seed/data,
    tests/test_graph_bf16.py; DEVIATIONS.md has the policy note). Pass
    graph_impl='mxu' for exact-f32 messages at ~20% more step time.
    """
    if graph_impl != "auto":
        return graph_impl
    if jax.default_backend() == "tpu" and num_edges >= _MXU_MIN_EDGES:
        return "mxu_bf16"
    return "segment"


def mxu_msg_dtype(impl: str):
    """Message dtype for a resolved 'mxu*' impl ('mxu_bf16' halves gather +
    message traffic, ~1e-3 feature rounding; see segsum_mxu.py numbers)."""
    import jax.numpy as jnp
    return jnp.bfloat16 if impl == "mxu_bf16" else jnp.float32


def graph_sharding_enabled(mesh) -> bool:
    """Whether graph models should shard their propagation: any mesh
    spanning more than one device (the propagation is the family's single
    hot path — reference skrec/recommender/LightGCN.py:89-100 — and the
    part whose memory/compute grows with the graph)."""
    return mesh is not None and mesh.devices.size > 1


def build_prop_graph(adj, graph_impl: str = "auto", mesh=None):
    """Lower a scipy adjacency for ``skrx.ops.graph.propagate`` using the
    implementation picked by :func:`resolve_graph_impl`.

    With ``mesh`` spanning >1 device the edges are partitioned by
    destination over ALL mesh axes and every propagate runs under
    ``shard_map`` with the node rows sharded (one all-gather per layer;
    skrx/parallel/graph_shard.py) — ``propagate(graph, x, edge_mask)``
    callers need no other change, and the per-device local reduction still
    follows the graph_impl policy (Pallas MXU kernel on TPU at scale)."""
    if graph_sharding_enabled(mesh):
        from ..parallel.graph_shard import ShardedPropGraph
        return ShardedPropGraph(mesh, adj, graph_impl)
    impl = resolve_graph_impl(graph_impl, adj.nnz)
    if impl.startswith("mxu"):
        from ..ops.pallas.segsum_mxu import mxu_graph_from_sp_matrix
        return mxu_graph_from_sp_matrix(adj, msg_dtype=mxu_msg_dtype(impl))
    from ..ops.graph import graph_from_sp_matrix
    return graph_from_sp_matrix(adj)


def graph_param_shardings(mesh, params):
    """NamedSharding pytree for sharded-graph training: every 2-D embedding
    table row-sharded over ALL mesh axes (matching the node-row layout the
    sharded propagate consumes — skrx/parallel/graph_shard.py), everything
    else replicated. Used as ``_finalize_setup_flat(param_shardings=...)``
    so the LightGCN family's tables + Adam moments split across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    axes = tuple(mesh.axis_names)
    rows = NamedSharding(mesh, P(axes, None))
    rep = NamedSharding(mesh, P())

    def spec(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] >= mesh.devices.size:
            return rows
        return rep

    return jax.tree_util.tree_map(spec, params)


def adam_l2(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam with ``weight_decay``: L2 term added to the GRADIENT
    before the Adam moments (unlike AdamW which decays after scaling)."""
    if weight_decay == 0.0:
        return optax.adam(lr)
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.scale_by_adam(),
                       optax.scale(-lr))


def make_train_step(optimizer: optax.GradientTransformation,
                    loss_fn: Callable):
    """Build ``(carry, batch) -> (carry, loss)`` with carry =
    (params, opt_state) from a pure loss function ``loss_fn(params, batch)``."""

    def train_step(carry, batch):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    return train_step


def make_sharded_train_step(optimizer: optax.GradientTransformation,
                            loss_fn: Callable, param_shardings):
    """Tensor-parallel variant of :func:`make_train_step`: the updated params
    are re-constrained to their NamedShardings every step so the whole-epoch
    ``lax.scan`` carry keeps its row-sharded layout (embedding tables split
    over the mesh 'model' axis; XLA inserts the gather/reduce-scatter
    collectives). Math is identical to the unsharded step."""

    def train_step(carry, batch):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(jax.lax.with_sharding_constraint,
                                        params, param_shardings)
        return (params, opt_state), loss

    return train_step


def make_flat_train_step(optimizer: optax.GradientTransformation,
                         loss_fn: Callable, params):
    """Like :func:`make_train_step` but with the whole parameter pytree
    raveled into ONE flat vector, so elementwise optimizers (Adam & friends)
    run as a handful of fused kernels instead of one set per leaf — measured
    ~1.7x faster per step for small embedding models on TPU (the update math
    is identical because these optimizers are elementwise).

    Returns (train_step, flat_params, opt_state, unravel) where
    ``train_step`` carries (flat, opt_state) and ``unravel(flat)`` restores
    the pytree for prediction/checkpointing.
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(params)
    opt_state0 = optimizer.init(flat0)

    def train_step(carry, batch):
        flat, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda f: loss_fn(unravel(f), batch))(flat)
        updates, opt_state = optimizer.update(grads, opt_state, flat)
        return (flat + updates, opt_state), loss

    return train_step, flat0, opt_state0, unravel


class ChunkedDotPredictMixin:
    """Adds ``predict_chunk(users, lo, hi)`` for models whose full-catalog
    score is ``user_vectors @ item_vectors.T (+ bias)``: enables
    RankingEvaluator.evaluate_chunked / huge catalogs without materializing
    (B, N). Subclasses implement ``_chunk_embeddings() -> (u_all, i_all)``
    (and optionally ``_chunk_bias() -> (N,) or None``).

    CONTRACT: ``_chunk_embeddings``/``_chunk_bias`` must return
    IDENTITY-STABLE arrays between parameter updates (memoize derived
    embeddings, as the graph family's ``_final_emb`` does) — downstream
    caches key on ``id()`` of the returned arrays (e.g. the serving
    packed-table cache, skrx/serve.py), so a model returning fresh arrays
    per call silently repacks the full item table on every request."""

    def _chunk_embeddings(self):
        raise NotImplementedError

    def _chunk_bias(self):
        return None

    def predict_chunk(self, users, item_lo: int, item_hi: int):
        import jax.numpy as jnp

        u_all, i_all = self._chunk_embeddings()
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        scores = u_all[users] @ i_all[item_lo:item_hi].T
        bias = self._chunk_bias()
        if bias is not None:
            scores = scores + bias[None, item_lo:item_hi]
        return scores

    def predict_topk(self, users, k: int, train_table=None):
        """Tensor-parallel exact top-k: the item catalog is row-sharded over
        the mesh 'model' axis, each shard scores only its slice (masking any
        train items that fall in it), takes a local top-k, and candidates are
        all-gathered and re-topped (two-stage exact merge,
        skrx/parallel/topk_merge.py) — the (B, N) score matrix never exists
        on one chip. Returns (values (B, k'), global ids (B, k')) with
        k' = min(k, num_items); -inf slots carry masked/padded ids.

        Requires ``self.mesh`` with model axis > 1 (no reference counterpart
        — skrec's predict materializes full (B, N) on one GPU,
        skrec/recommender/BPRMF.py:145-147).
        """
        import jax.numpy as jnp

        from ..parallel import sharded_dot_topk

        u_all, i_all = self._chunk_embeddings()
        bias = self._chunk_bias()
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        uv = u_all[users]
        n_items = int(i_all.shape[0])
        if train_table is None:
            train_table = jnp.full((users.shape[0], 1), n_items, jnp.int32)
        return sharded_dot_topk(
            self.mesh, uv, i_all, bias, k, n_items, train_table,
            self.__dict__.setdefault("_topk_fns", {}),
            score_fn=getattr(self, "_topk_score_fn", None))


class CachedUserVecChunkMixin:
    """``predict_chunk`` for towers whose predict factors into an expensive
    per-user encoder followed by a cheap per-item score (SASRec/BERT4Rec/
    Caser/HGN/SGAT): the user representation is computed ONCE per (params,
    user batch) and catalog chunks are scored from it, so chunked evaluation
    neither re-runs the encoder per chunk nor materializes (B, N).

    Subclasses implement ``_user_vectors(users) -> pytree`` (jitted encoder)
    and ``_score_user_chunk(uv, item_lo, item_hi) -> (B, hi-lo)``; models with
    derived predict state beyond ``self.params`` (e.g. SGAT's propagated item
    table) extend ``_uv_state_refs`` so the cache invalidates with it.
    """

    def _user_vectors(self, users):
        raise NotImplementedError

    def _score_user_chunk(self, uv, item_lo: int, item_hi: int):
        raise NotImplementedError

    def _uv_state_refs(self) -> tuple:
        # strong refs compared by identity: holding them prevents id reuse
        return (self.params,)

    def _cached_user_vectors(self, users: np.ndarray):
        """User vectors for ``users``, computed once per (state, user batch)."""
        import jax.numpy as jnp

        refs = self._uv_state_refs()
        cached = getattr(self, "_uv_cache", None)
        if (cached is None or len(cached[0]) != len(refs)
                or any(a is not b for a, b in zip(cached[0], refs))
                or cached[1] != users.tobytes()):
            uv = self._user_vectors(jnp.asarray(users))
            cached = (refs, users.tobytes(), uv)
            self._uv_cache = cached
        return cached[2]

    def predict_chunk(self, users, item_lo: int, item_hi: int):
        users = np.asarray(users, dtype=np.int32)
        return self._score_user_chunk(self._cached_user_vectors(users),
                                      item_lo, item_hi)

    def _topk_factors(self, uv):
        """Dot factorization of the catalog score: returns ``(uv2, table,
        bias)`` such that ``predict(users) == uv2 @ table.T + bias`` up to a
        per-ROW constant (which cannot change each row's ranking), where
        ``uv = _user_vectors(users)``. ``table`` covers exactly predict's
        column range. The factors must not depend on ``uv``'s values (pass
        it through untouched) — the evaluator probes with ``uv=None`` to
        read the factor width. Enables tensor-parallel evaluation
        (predict_topk) and fused single-kernel eval for the sequence-tower
        family — their
        parameters are tiny (train-side TP is not worth it, NEXT.md #5) but
        full-catalog SCORING is the eval bottleneck and shards perfectly
        over the item axis."""
        raise NotImplementedError

    def predict_topk(self, users, k: int, train_table=None):
        """Tensor-parallel exact top-k for tower models: the user encoder
        runs replicated on the batch (tiny), then the catalog dot is
        row-sharded over the mesh 'model' axis with a two-stage merge
        (skrx/parallel/topk_merge.py) — the (B, N) score matrix never exists
        on one chip. Same contract as ChunkedDotPredictMixin.predict_topk."""
        import jax.numpy as jnp

        from ..parallel import sharded_dot_topk

        users = np.asarray(users, dtype=np.int32)
        uv2, table, bias = self._topk_factors(self._cached_user_vectors(users))
        n_items = int(table.shape[0])
        if train_table is None:
            train_table = jnp.full((len(users), 1), n_items, jnp.int32)
        return sharded_dot_topk(
            self.mesh, uv2, table, bias, k, n_items, train_table,
            self.__dict__.setdefault("_topk_fns", {}),
            score_fn=getattr(self, "_topk_score_fn", None))


class EpochTrainedRecommender(JaxRecommender):
    """Base for models trained by a whole-epoch device pipeline.

    Subclass contract: after ``super().__init__`` the subclass sets
    ``self.params``, ``self.optimizer``, ``self.pipeline``,
    ``self._train_step`` (via :func:`make_train_step`), and ``self._rng``.
    """

    params = None
    optimizer = None
    pipeline = None
    _train_step = None
    _rng = None

    _use_flat = False

    def _finalize_setup(self, run_seed: int):
        self.opt_state = self.optimizer.init(self.params)
        self._rng = jax.random.key(run_seed + 1)

    def _finalize_setup_flat(self, run_seed: int, loss_fn: Callable,
                             param_shardings=None):
        """Fused flat-parameter variant of :meth:`_finalize_setup` for models
        whose step is a plain loss_fn + elementwise optimizer (see
        :func:`make_flat_train_step`).

        With a tensor-parallel mesh (model axis > 1) the flat raveling would
        destroy per-table row shardings, so this routes to a per-leaf step
        with the embedding tables row-sharded over the 'model' axis
        (:func:`make_sharded_train_step`); math is identical either way.
        An explicit ``param_shardings`` pytree (e.g.
        :func:`graph_param_shardings` for sharded-graph training) overrides
        that default placement."""
        from ..parallel.mesh import model_parallel_size

        if param_shardings is not None:
            # best-effort jitted placement (with_sharding_constraint, not
            # eager device_put): tables whose row count doesn't divide the
            # full mesh get the closest compatible sharding (e.g. rows split
            # over 'data' only) instead of a hard error
            self.params = jax.jit(lambda p: jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, p,
                param_shardings))(self.params)
            self._train_step = make_sharded_train_step(
                self.optimizer, loss_fn, param_shardings)
            self._finalize_setup(run_seed)
            return
        if model_parallel_size(self.mesh) > 1:
            from ..parallel import mf_param_shardings, shard_params_for_mf
            self.params = shard_params_for_mf(self.mesh, self.params)
            self._train_step = make_sharded_train_step(
                self.optimizer, loss_fn,
                mf_param_shardings(self.mesh, self.params))
            self._finalize_setup(run_seed)
            return
        (self._train_step, self._flat, self.opt_state,
         self._unravel) = make_flat_train_step(self.optimizer, loss_fn,
                                               self.params)
        self._rng = jax.random.key(run_seed + 1)
        self._use_flat = True

    def _train_epoch(self, epoch: int) -> Optional[float]:
        key = jax.random.fold_in(self._rng, epoch)
        if self._use_flat:
            (self._flat, self.opt_state), loss = self.pipeline.run_epoch(
                key, (self._flat, self.opt_state), self._train_step)
            self.params = self._unravel(self._flat)
        else:
            (self.params, self.opt_state), loss = self.pipeline.run_epoch(
                key, (self.params, self.opt_state), self._train_step)
        return float(loss)

    def _load_train_state(self, state) -> None:
        super()._load_train_state(state)
        if self._use_flat:
            from jax.flatten_util import ravel_pytree
            self._flat, _ = ravel_pytree(self.params)
        else:
            from ..parallel.mesh import model_parallel_size
            if model_parallel_size(self.mesh) > 1:
                from ..parallel import shard_params_for_mf
                self.params = shard_params_for_mf(self.mesh, self.params)

    def predict(self, users):
        import jax.numpy as jnp
        users = jnp.asarray(np.asarray(users, dtype=np.int32))
        return self._predict_fn(self.params, users)
