"""On-device top-K ranking metrics.

TPU-native replacement for the reference's C++ ranking kernel
(skrec/utils/py/cython/include/evaluate.h:24-76, metric.h:19-118,
pyx_eval_matrix.pyx:22-37). Where the reference runs one thread-pool task per
user doing a partial_sort plus scalar metric loops, here the whole batch is
one fused XLA program: scatter -inf over train items, `lax.top_k`, a
vectorized membership test, and all five cumulative metrics as prefix ops on
the (B, K) hit matrix. Everything stays in HBM.

Exact-parity notes (SURVEY §7.3):

* All metrics are *cumulative*: value at column k is the metric of the
  length-(k+1) ranking prefix — mirroring metric.h where ``result_pt[i]`` is
  written for every i.
* ``truth_len`` is clamped to >= 1 (metric.h:36,54,73).
* MAP's denominator is ``min(truth_len, k+1)`` (metric.h:63).
* NDCG's iDCG accumulates 1/log2(i+2) only while ``i < truth_len``
  (metric.h:80-83).
* MRR fills the tail after the first hit (metric.h:89-109); expressed as the
  running max of hit[i]/(i+1), which is identical because reciprocal rank
  decreases with position.
* The C++ kernel partial-sorts 2*K candidates then cuts K to dodge a
  partial_sort tie bug (evaluate.h:33-45); `lax.top_k` is exact (ties broken
  by lower index) so no workaround is needed.

Metric ids follow the reference: {Precision:1, Recall:2, MAP:3, NDCG:4, MRR:5}
(evaluator.py:57).
"""
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["METRIC2ID", "ID2METRIC", "ranking_metrics_from_hits",
           "hits_from_ranks",
           "topk_from_scores", "mask_items", "masked_topk_indices",
           "topk_scores_and_indices",
           "eval_score_matrix_device", "eval_score_matrix_device_paged",
           "hits_against_padded_truth"]

METRIC2ID = {"Precision": 1, "Recall": 2, "MAP": 3, "NDCG": 4, "MRR": 5}
ID2METRIC = {v: k for k, v in METRIC2ID.items()}


def mask_items(scores: jnp.ndarray, item_table: jnp.ndarray,
               fill_value=-jnp.inf) -> jnp.ndarray:
    """Set ``scores[b, item_table[b, :]] = fill_value``, ignoring padded
    entries (pad id >= num_items is dropped by the out-of-bounds scatter
    mode). Device equivalent of evaluator.py:197-200's train-item masking."""
    b = scores.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], item_table.shape)
    return scores.at[rows, item_table].set(fill_value, mode="drop")


# catalogs at/beyond this stream through the Pallas threshold-pruned
# kernel. Round 5 (after the dense-OR pack_mask removed the scatter that
# used to dominate small shapes): the kernel wins from ~4k items at real
# batch sizes — measured 4.5-15x over masked lax.top_k at N=4096-16384,
# B=512-8192, and ~neutral (0.99-1.9x) only at B=64 tiny batches; the old
# 32768 gate was calibrated against the scatter-dominated kernel. The
# structural guard below (n/128 >= 2k) still keeps genuinely tiny
# catalogs on lax.top_k.
_BLOCKWISE_TOPK_MIN_N = 4096


def _pad_rank_sentinel(idx: jnp.ndarray, k: int, num_items: int):
    """Pad (B, k_eff) indices to (B, k) with the never-hit id
    ``num_items + 1`` — distinct from both every catalog id AND the truth
    tables' pad id (= num_items) — for catalogs smaller than the metric
    cutoff: ranks past the catalog are misses, matching the reference's
    partial_sort of < k candidates."""
    pad = k - idx.shape[1]
    if pad <= 0:
        return idx
    fill = jnp.full((idx.shape[0], pad), num_items + 1, idx.dtype)
    return jnp.concatenate([idx, fill], axis=1)


def _use_blockwise(n: int, k: int) -> bool:
    # the threshold-prune needs n/128 >= k stride-128 group maxima
    # for a finite tau, with margin so tau stays tight; below that the
    # kernel degrades toward the naive k*N argmax loop
    return (n >= _BLOCKWISE_TOPK_MIN_N and n // 128 >= 2 * k
            and jax.default_backend() == "tpu")


def _use_small_ranks(n: int, t: int) -> bool:
    # whole-row direct rank counting: the row must fit VMEM and the probe
    # loop is unrolled per test column (topk_blocks.masked_topk_ranks_small)
    return n <= 16384 and t <= 128 and jax.default_backend() == "tpu"


def topk_scores_and_indices(scores: jnp.ndarray, k: int,
                            mask_table: jnp.ndarray = None,
                            allow_pallas: bool = True
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (values, indices) top-k per row, with ``mask_table`` items
    excluded when given (out-of-range table entries are padding and ignored).

    Large catalogs route to the Pallas threshold-pruned kernel on TPU with
    the masking fused into the selection (2.5x over the XLA scatter +
    lax.top_k path at (1024, 41k), 5.6x at (64, 1M) — topk_blocks.py);
    small ones use plain (masked) ``lax.top_k``. Catalogs smaller than k
    pad the tail ranks with -inf values and a never-hit sentinel id.
    ``allow_pallas=False`` forces the XLA path — callers evaluating over a
    multi-device mesh must use it (Pallas calls aren't SPMD-partitionable;
    XLA would replicate the sharded operands around them)."""
    n = scores.shape[1]
    if allow_pallas and _use_blockwise(n, k):
        from .pallas import blockwise_topk
        return blockwise_topk(scores, k, mask_table=mask_table)
    if mask_table is not None:
        scores = mask_items(scores, mask_table)
    vals, idx = lax.top_k(scores, min(k, n))
    if idx.shape[1] < k:
        fill = jnp.full((vals.shape[0], k - vals.shape[1]), -jnp.inf,
                        vals.dtype)
        vals = jnp.concatenate([vals, fill], axis=1)
        idx = _pad_rank_sentinel(idx, k, n)
    return vals, idx


def topk_from_scores(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k item indices per row (descending score); see
    :func:`topk_scores_and_indices` for the routing."""
    return topk_scores_and_indices(scores, k)[1]


def masked_topk_indices(scores: jnp.ndarray, mask_table: jnp.ndarray,
                        k: int) -> jnp.ndarray:
    """Top-k indices with ``mask_table`` items excluded; see
    :func:`topk_scores_and_indices` for the routing."""
    return topk_scores_and_indices(scores, k, mask_table=mask_table)[1]


def hits_from_ranks(ranks: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, K) float32 hit matrix from (B, T) test-item ranks: position r
    is a hit iff some test item's rank == r; ranks >= k (the never-hit
    clamp used for masked/-inf/out-of-range items) fall outside and
    produce no hit. The single definition of the rank->hit contract shared
    by the score-reading and fused eval paths."""
    return jnp.any(
        ranks[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :],
        axis=1).astype(jnp.float32)


def hits_against_padded_truth(topk_items: jnp.ndarray,
                              truth_table: jnp.ndarray) -> jnp.ndarray:
    """(B, K) float32 hit indicator: topk item appears in the row's truth set.

    ``truth_table`` is (B, T) padded with an id that can never be ranked
    (pad id = num_items), so padding produces no false hits.
    """
    eq = topk_items[:, :, None] == truth_table[:, None, :]
    return jnp.any(eq, axis=-1).astype(jnp.float32)


def ranking_metrics_from_hits(hits: jnp.ndarray, truth_len: jnp.ndarray,
                              metric_ids: Sequence[int]) -> jnp.ndarray:
    """Cumulative metrics (B, n_metrics, K) from a hit matrix.

    Args:
        hits: (B, K) float32 0/1.
        truth_len: (B,) int32 number of true test items per user.
        metric_ids: which metrics, in output order (reference ids).
    """
    b, k = hits.shape
    pos = jnp.arange(1, k + 1, dtype=jnp.float32)          # (K,) 1-based rank
    truth = jnp.maximum(truth_len.astype(jnp.float32), 1.0)[:, None]  # (B,1)

    cum_hits = jnp.cumsum(hits, axis=-1)                    # (B,K)
    precision = cum_hits / pos
    recall = cum_hits / truth
    ap = jnp.cumsum(hits * precision, axis=-1) / jnp.minimum(truth, pos)
    inv_log = 1.0 / jnp.log2(pos + 1.0)                     # 1/log2(i+2)
    dcg = jnp.cumsum(hits * inv_log, axis=-1)
    idcg = jnp.cumsum(jnp.where(pos[None, :] <= truth, inv_log[None, :], 0.0),
                      axis=-1)
    ndcg = dcg / idcg
    mrr = lax.cummax(hits / pos, axis=1)

    by_id = {1: precision, 2: recall, 3: ap, 4: ndcg, 5: mrr}
    return jnp.stack([by_id[m] for m in metric_ids], axis=1)


@partial(jax.jit, static_argnames=("metric_ids", "top_k", "use_pallas"))
def eval_score_matrix_device(scores: jnp.ndarray,
                             train_table: jnp.ndarray,
                             test_table: jnp.ndarray,
                             test_len: jnp.ndarray,
                             metric_ids: Tuple[int, ...],
                             top_k: int,
                             use_pallas: bool = True) -> jnp.ndarray:
    """Fused evaluation of one user batch, entirely on device.

    scores: (B, N) float32 full-catalog scores.
    train_table: (B, maxTr) int32 train items, padded with an id >= N.
    test_table: (B, maxTe) int32 test items, padded with an id >= N.
    test_len: (B,) int32.
    use_pallas: route big catalogs through the Pallas top-k kernel; pass
        False when the operands are sharded over a multi-device mesh.
    Returns (B, n_metrics, top_k) float32 — same numbers the reference's
    ``eval_score_matrix`` produces as (B, n_metrics*top_k).

    Big-catalog TPU route (round 5): the sorted top-k ids are never needed
    for metrics — only the rank positions of the few test items — so the
    Pallas path counts each test item's exact rank over the candidate set
    (``masked_topk_ranks``) and one-hots the ranks into the hit matrix,
    skipping the merge kernel entirely (4.1 ms of a 16.3 ms eval call at
    (16384, 40960) k=50). Hit semantics are identical to [top-k ids ->
    id-vs-truth compare] including tie-breaking and the -inf/masked
    never-hit contract (see the kernel docstring's exactness argument).
    """
    n = scores.shape[1]
    ranks = None
    if use_pallas and scores.dtype == jnp.float32:
        if _use_blockwise(n, top_k):
            from .pallas import masked_topk_ranks
            ranks = masked_topk_ranks(scores, top_k, test_table,
                                      mask_table=train_table)
        elif _use_small_ranks(n, test_table.shape[1]):
            # below the blockwise gate lax.top_k's fixed ~2.7 us/row would
            # dominate (44 ms at (16384, 2048) — the ML-100k/ML-1M regime);
            # a whole-row direct rank count is ~100x cheaper
            from .pallas import masked_topk_ranks_small
            ranks = masked_topk_ranks_small(scores, top_k, test_table,
                                            mask_table=train_table)
    if ranks is not None:
        hits = hits_from_ranks(ranks, top_k)
    else:
        vals_idx = topk_scores_and_indices(
            scores, top_k, mask_table=train_table, allow_pallas=use_pallas)
        hits = hits_against_padded_truth(vals_idx[1], test_table)
    return ranking_metrics_from_hits(hits, test_len, metric_ids)


@partial(jax.jit, static_argnames=("metric_ids", "top_k", "use_pallas"))
def eval_score_matrix_device_paged(scores_g: jnp.ndarray,
                                   train_g: jnp.ndarray,
                                   test_g: jnp.ndarray,
                                   test_len_g: jnp.ndarray,
                                   metric_ids: Tuple[int, ...],
                                   top_k: int,
                                   use_pallas: bool = True) -> jnp.ndarray:
    """:func:`eval_score_matrix_device` over G stacked eval pages in ONE
    device dispatch (``lax.scan`` over the leading axis).

    Why this exists: on a high-RTT host (the axon tunnel costs ~1 ms per
    dispatch that does NOT overlap device execution) a per-batch Python
    eval loop pays the round trip G times; paging recovers it — measured
    251k -> ~430k users/s dispatch-inclusive at (1024, 40960) top-50.
    Numerics are identical to G separate calls (scan of the same program).

    scores_g: (G, B, N); train_g/test_g: (G, B, L*); test_len_g: (G, B).
    Returns (G, B, n_metrics, top_k).

    Round-5 structure: no scan at all — the pages FLATTEN into one
    (G*B, N) batch through the one kernel call (blockwise_topk tiles the
    batch dim at block_b rows internally, so a bigger batch is just more
    grid programs), and the hits + metric tail runs once over the
    flattened rows. The previous lax.scan paid a dynamic-slice COPY of
    each 168 MB score page per iteration plus ~0.6 ms of fixed tiny-op
    kernel overhead per page for the tail; flattening removes both
    (numerics identical: every row is independent).
    """
    g, b, n = scores_g.shape
    out = eval_score_matrix_device(
        scores_g.reshape(g * b, n), train_g.reshape(g * b, -1),
        test_g.reshape(g * b, -1), test_len_g.reshape(g * b), metric_ids,
        top_k, use_pallas)
    return out.reshape(g, b, len(metric_ids), top_k)
