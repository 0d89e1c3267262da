"""On-device negative sampling.

TPU-native replacement for the reference's C++ rejection sampler
(skrec/utils/py/cython/include/randint.h:22-128, pyx_random.pyx:20-110):
instead of a host thread pool doing per-user rejection against hash sets,
the whole batch is sampled inside jit with counter-based `jax.random` keys,
membership tested against the per-user **sorted padded positive table**
(binary search via `searchsorted`, vectorized over the batch), and resolved
with a fixed number of parallel trials.

Semantics: uniform over [0, num_items) \\ user_positives, resampled every
epoch (reference data_iterator.py:81-94). With T trials the probability that
all candidates collide is (n_pos/N)^T — at T=8 and the densest realistic user
(n_pos/N = 0.5) that is 0.4%, and such users are pathological; the fallback
keeps the last candidate. This deviation from exact rejection is documented
(SURVEY §7.3 "Negative-sampling semantics") and is far below run-to-run
metric variance.

Weighted sampling (popularity^alpha, GRU4RecPlus.py:102-106) uses
`jax.random.categorical` over static log-weights; exclusion handled the same
way. Gumbel top-k supplies without-replacement draws (LayerGCN/FREEDOM edge
pruning).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["is_member_sorted", "sample_negatives", "sample_negatives_weighted",
           "gumbel_topk_without_replacement"]


_BROADCAST_MEMBER_MAX_P = 2048


def is_member_sorted(sorted_rows: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized membership test.

    sorted_rows: (B, P) rows sorted ascending (padded with a sentinel larger
    than any query). queries: (B, Q). Returns (B, Q) bool.

    For small P a fused broadcast-compare + any-reduce is used — on TPU this
    is pure VPU work and ~50x faster than a lowered per-row searchsorted.
    For large P a vectorized binary search (log2 P rounds of
    `take_along_axis` gathers) keeps the cost logarithmic.
    """
    p = sorted_rows.shape[1]
    if p <= _BROADCAST_MEMBER_MAX_P:
        return jnp.any(queries[:, :, None] == sorted_rows[:, None, :], axis=-1)

    # vectorized binary search: lo/hi per (row, query)
    q = queries.shape[1]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, p, jnp.int32)
    n_rounds = int(np.ceil(np.log2(p))) + 1
    for _ in range(n_rounds):
        mid = (lo + hi) // 2
        vals = jnp.take_along_axis(sorted_rows, jnp.minimum(mid, p - 1), axis=1)
        go_right = vals < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    found = jnp.take_along_axis(sorted_rows, jnp.minimum(lo, p - 1), axis=1)
    return found == queries


@partial(jax.jit, static_argnames=("num_items", "num_neg", "num_trials"))
def sample_negatives(key: jax.Array, users: jnp.ndarray,
                     pos_table: jnp.ndarray, num_items: int,
                     num_neg: int = 1, num_trials: int = 8) -> jnp.ndarray:
    """Uniform negatives with per-user exclusion.

    Args:
        key: PRNG key.
        users: (B,) int32 user of each training example.
        pos_table: (U, P) int32 sorted padded positives (pad id = num_items).
        num_items: catalog size N.
        num_neg: negatives per example.
        num_trials: parallel rejection trials.

    Returns (B, num_neg) int32 (squeeze to (B,) at the call site if needed).
    """
    b = users.shape[0]
    rows = pos_table[users]  # (B, P)
    cand = jax.random.randint(key, (b, num_neg * num_trials), 0, num_items,
                              dtype=jnp.int32)
    member = is_member_sorted(rows, cand).reshape(b, num_neg, num_trials)
    cand = cand.reshape(b, num_neg, num_trials)
    valid = ~member
    # First valid trial; if none valid (astronomically rare), argmax gives 0 —
    # we then keep the *last* candidate, matching the doc above.
    any_valid = jnp.any(valid, axis=-1)
    first_valid = jnp.argmax(valid, axis=-1)
    pick = jnp.where(any_valid, first_valid, num_trials - 1)
    return jnp.take_along_axis(cand, pick[..., None], axis=-1)[..., 0]


@partial(jax.jit, static_argnames=("num_neg", "num_trials"))
def sample_negatives_weighted(key: jax.Array, users: jnp.ndarray,
                              pos_table: jnp.ndarray,
                              log_weights: jnp.ndarray,
                              num_neg: int = 1,
                              num_trials: int = 8) -> jnp.ndarray:
    """Like :func:`sample_negatives` but draws items from
    ``softmax(log_weights)`` (e.g. popularity^alpha: pass
    ``alpha * log(count)``)."""
    b = users.shape[0]
    rows = pos_table[users]
    keys = jax.random.split(key, num_neg * num_trials)
    cand = jnp.stack([jax.random.categorical(k, log_weights, shape=(b,))
                      for k in keys], axis=-1).astype(jnp.int32)
    member = is_member_sorted(rows, cand).reshape(b, num_neg, num_trials)
    cand = cand.reshape(b, num_neg, num_trials)
    valid = ~member
    any_valid = jnp.any(valid, axis=-1)
    first_valid = jnp.argmax(valid, axis=-1)
    pick = jnp.where(any_valid, first_valid, num_trials - 1)
    return jnp.take_along_axis(cand, pick[..., None], axis=-1)[..., 0]


def gumbel_topk_without_replacement(key: jax.Array, log_weights: jnp.ndarray,
                                    k: int) -> jnp.ndarray:
    """Sample k indices without replacement ~ weights via Gumbel-top-k.

    Device equivalent of ``torch.multinomial(w, k, replacement=False)`` used
    for per-epoch edge pruning (LayerGCN.py:137-152, FREEDOM.py:175-190).
    """
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, log_weights.shape, minval=1e-20, maxval=1.0)))
    _, idx = jax.lax.top_k(log_weights + gumbel, k)
    return idx
