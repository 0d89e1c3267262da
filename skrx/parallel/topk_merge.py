"""Sharded full-catalog scoring + distributed top-k merge.

No reference counterpart (single-GPU predict materializes the full (B, N)
score matrix on one device, BPRMF.py:145-147). With the item catalog
row-sharded over the ``model`` mesh axis, each shard scores only its item
slice, takes a local ``lax.top_k``, and the k-candidate lists are all-gathered
and re-topped — the full (B, N) matrix never exists on one chip. This is the
standard two-stage top-k merge (exact: the global top-k is contained in the
union of per-shard top-k).
"""
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["sharded_topk_scores", "local_then_global_topk"]


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
