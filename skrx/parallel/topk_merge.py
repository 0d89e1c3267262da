"""Sharded full-catalog scoring + distributed top-k merge.

No reference counterpart (single-GPU predict materializes the full (B, N)
score matrix on one device, BPRMF.py:145-147). With the item catalog
row-sharded over the ``model`` mesh axis, each shard scores only its item
slice, takes a local ``lax.top_k``, and the k-candidate lists are all-gathered
and re-topped — the full (B, N) matrix never exists on one chip. This is the
standard two-stage top-k merge (exact: the global top-k is contained in the
union of per-shard top-k).
"""
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS, model_parallel_size

__all__ = ["sharded_topk_scores", "local_then_global_topk",
           "sharded_dot_topk"]


def local_then_global_topk(scores_local: jnp.ndarray, k: int,
                           axis_name: str, shard_offset: jnp.ndarray):
    """Inside shard_map: local top-k over this shard's item slice, then
    all-gather candidates over ``axis_name`` and take the global top-k.

    scores_local: (B, N_local); shard_offset: scalar int — global id of this
    shard's first item. Returns (values (B, k), global indices (B, k)).
    """
    vals, idx = jax.lax.top_k(scores_local, k)
    idx = idx + shard_offset
    all_vals = jax.lax.all_gather(vals, axis_name, axis=1, tiled=True)   # (B, S*k)
    all_idx = jax.lax.all_gather(idx, axis_name, axis=1, tiled=True)
    top_vals, pos = jax.lax.top_k(all_vals, k)
    top_idx = jnp.take_along_axis(all_idx, pos, axis=1)
    return top_vals, top_idx


def sharded_topk_scores(mesh: Mesh, score_fn: Callable, k: int):
    """Build a function (params, users) -> (topk values, topk global item ids)
    that evaluates ``score_fn(params, users, item_lo, item_hi)`` per model
    shard and merges top-k across the mesh.

    ``score_fn`` must return the (B, N_local) scores of this item slice given
    replicated user inputs. The item table inside params must be row-sharded
    over MODEL_AXIS for this to avoid replication.
    """

    def scores_local_fn(params, users, n_items_total):
        axis_idx = jax.lax.axis_index(MODEL_AXIS)
        n_shards = jax.lax.axis_size(MODEL_AXIS)
        shard_size = n_items_total // n_shards
        offset = axis_idx * shard_size
        local = score_fn(params, users, offset, shard_size)
        return local_then_global_topk(local, k, MODEL_AXIS, offset)

    return scores_local_fn


def sharded_dot_topk(mesh: Mesh, uv: jnp.ndarray, i_all: jnp.ndarray,
                     bias: Optional[jnp.ndarray], k: int, n_items: int,
                     train_table: jnp.ndarray, cache: Dict,
                     score_fn: Optional[Callable] = None,
                     use_pallas: Optional[bool] = None):
    """Exact train-masked top-k of ``uv @ i_all.T + bias`` with the item
    catalog row-sharded over the mesh 'model' axis (two-stage merge) — the
    (B, N) score matrix never exists on one chip.

    Shared engine behind ``ChunkedDotPredictMixin.predict_topk`` (dot-predict
    family) and ``CachedUserVecChunkMixin.predict_topk`` (sequence towers,
    whose encoder runs replicated and whose catalog score is a dot).
    Returns (values (B, k'), global ids (B, k')) with k' = min(k, n_items,
    shards * per-shard-k); -inf value slots carry masked/padded ids.

    ``score_fn(uv, item_shard, bias_shard) -> (B, S) scores`` overrides the
    default dot for non-inner-product scores (e.g. SGAT's euclidean
    distance); it is traced inside shard_map, so it must be a pure jax
    function, and it must be a STABLE callable (created once per model) —
    the compiled program is memoized per (mesh, shapes) in ``cache``.

    ``cache`` memoizes the jitted shard_map per (mesh, shapes); pass a dict
    owned by the caller so its lifetime matches the model's.

    Selection kernels (round 5): inside ``shard_map`` each device runs on
    its LOCAL shard, so the Pallas kernels apply per-device (manual
    sharding, not auto-partitioning — the same pattern as
    graph_shard._make_sharded_propagate_mxu): the local masked top-k routes
    through ``blockwise_topk`` when the per-shard width clears the
    threshold-prune gate, and the (B, m*k) candidate merge through
    ``vmem_topk`` (lax.top_k costs a fixed ~2.7 us/row on TPU at ANY
    width). ``use_pallas`` None = auto (TPU); True forces the kernels in
    interpret mode (CPU equivalence tests); False forces the XLA path.
    """
    m = model_parallel_size(mesh)
    assert m > 1, "sharded_dot_topk needs a mesh with model axis > 1"
    uv = jnp.asarray(uv, jnp.float32)
    i_all = jnp.asarray(i_all, jnp.float32)
    shard = -(-n_items // m)
    pad = shard * m - n_items
    if pad:
        i_all = jnp.pad(i_all, ((0, pad), (0, 0)))
    if bias is None:
        bias = jnp.zeros((shard * m,), jnp.float32)
    elif pad:
        bias = jnp.pad(jnp.asarray(bias, jnp.float32), (0, pad))
    else:
        bias = jnp.asarray(bias, jnp.float32)
    i_all = jax.device_put(i_all, NamedSharding(mesh, P(MODEL_AXIS, None)))
    bias = jax.device_put(bias, NamedSharding(mesh, P(MODEL_AXIS)))
    train_table = jnp.asarray(train_table, jnp.int32)

    key = (id(mesh), k, n_items, int(uv.shape[0]), int(uv.shape[1]),
           int(train_table.shape[1]), use_pallas)
    fn = cache.get(key)
    if fn is None:
        from ..ops.metrics import _use_blockwise

        k_local = min(k, shard)
        k_glob = min(k, m * k_local, n_items)
        forced = use_pallas is True
        on_tpu = jax.default_backend() == "tpu"
        # per-device local selection: Pallas threshold-pruned kernel when
        # the PER-SHARD width clears its gate (auto), or when forced
        local_pallas = (forced or (use_pallas is None
                                   and _use_blockwise(shard, k_local)))
        merge_pallas = forced or (use_pallas is None and on_tpu)
        interpret = not on_tpu

        def shard_fn(uv, item_shard, bias_shard, train_tab):
            offset = jax.lax.axis_index(MODEL_AXIS) * shard
            if score_fn is not None:
                scores = score_fn(uv, item_shard, bias_shard)
            else:
                scores = uv @ item_shard.T + bias_shard[None, :]
            ids = offset + jnp.arange(shard)
            # catalog padding rows can never rank
            scores = jnp.where(ids[None, :] < n_items, scores, -jnp.inf)
            # mask this shard's slice of the train items; out-of-slice ids
            # (incl. the table's pad id) go out of bounds -> dropped. NB
            # negative locals would WRAP in the scatter — send them out of
            # bounds explicitly.
            local = train_tab - offset
            local = jnp.where(local < 0, shard, local)
            if local_pallas:
                from ..ops.pallas import blockwise_topk
                vals, idx = blockwise_topk(scores, k_local, mask_table=local,
                                           interpret=interpret)
            else:
                rows = jnp.broadcast_to(
                    jnp.arange(scores.shape[0])[:, None], local.shape)
                scores = scores.at[rows, local].set(-jnp.inf, mode="drop")
                vals, idx = jax.lax.top_k(scores, k_local)
            idx = idx + offset
            all_vals = jax.lax.all_gather(vals, MODEL_AXIS, axis=1,
                                          tiled=True)
            all_idx = jax.lax.all_gather(idx, MODEL_AXIS, axis=1, tiled=True)
            if merge_pallas:
                # id-value tie-break == lowest-global-index (the candidate
                # streams are per-shard rank-ordered, so equal values sit
                # in ascending global-id position order either way)
                from ..ops.pallas import vmem_topk
                return vmem_topk(all_vals, all_idx, k_glob,
                                 interpret=interpret)
            top_vals, pos = jax.lax.top_k(all_vals, k_glob)
            return top_vals, jnp.take_along_axis(all_idx, pos, axis=1)

        fn = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None), P(MODEL_AXIS), P()),
            out_specs=(P(), P()), check_vma=False))
        cache[key] = fn
    return fn(uv, i_all, bias, train_table)
