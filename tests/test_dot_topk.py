"""Fused score+top-k (dot_topk): exactness vs materialized scores.

The kernel recomputes uv @ items.T + bias inside both selection passes so
the (B, N) score matrix never exists (skrx/ops/pallas/dot_topk.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx.ops.metrics import mask_items
from skrx.ops.pallas import dot_topk


def _ref(uv, items, bias, k, table=None):
    scores = jnp.asarray(uv) @ jnp.asarray(items).T
    if bias is not None:
        scores = scores + jnp.asarray(bias)[None, :]
    if table is not None:
        scores = mask_items(scores, jnp.asarray(table))
    return jax.lax.top_k(scores, k)


@pytest.mark.parametrize("b,n,d,block_n", [(8, 1000, 16, 256),
                                           (11, 520, 32, 128),
                                           (6, 130, 8, 128)])
def test_dot_topk_matches_materialized(b, n, d, block_n):
    rng = np.random.default_rng(0)
    uv = rng.standard_normal((b, d)).astype(np.float32)
    items = rng.standard_normal((n, d)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32)
    v, i = dot_topk(jnp.asarray(uv), jnp.asarray(items), jnp.asarray(bias),
                    17, block_n=block_n, block_b=4, interpret=True)
    rv, ri = _ref(uv, items, bias, 17)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_dot_topk_no_bias_and_mask():
    rng = np.random.default_rng(3)
    b, n, d, L, k = 9, 900, 24, 40, 13
    uv = rng.standard_normal((b, d)).astype(np.float32)
    items = rng.standard_normal((n, d)).astype(np.float32)
    table = np.full((b, L), n, dtype=np.int32)
    for r in range(b):
        cnt = rng.integers(1, L + 1)
        table[r, :cnt] = np.sort(rng.permutation(n)[:cnt])
    v, i = dot_topk(jnp.asarray(uv), jnp.asarray(items), None, k,
                    mask_table=jnp.asarray(table), block_n=128,
                    interpret=True)
    rv, ri = _ref(uv, items, None, k, table)
    rvn = np.asarray(rv)
    finite = np.isfinite(rvn)
    np.testing.assert_allclose(np.asarray(v)[finite], rvn[finite], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i)[finite],
                                  np.asarray(ri)[finite])


def test_dot_topk_pad_columns_never_rank():
    """Catalog padding rows (zero vectors) must not outrank negative
    scores — the -inf pad travels through the bias."""
    uv = -np.ones((4, 8), np.float32)
    items = np.ones((130, 8), np.float32)   # every true score = -8
    v, i = dot_topk(jnp.asarray(uv), jnp.asarray(items), None, 5,
                    block_n=128, interpret=True)
    assert int(np.asarray(i).max()) < 130
    np.testing.assert_allclose(np.asarray(v), -8.0)


# ------------------------------------------------- round 5: merge-free
# fused rank counting (dot_topk_ranks)


def _dot_oracle_hits(uv, items, bias, mask, test, k):
    from skrx.ops.metrics import hits_against_padded_truth, mask_items
    scores = jnp.asarray(uv) @ jnp.asarray(items).T \
        + jnp.asarray(bias)[None, :]
    sm = mask_items(scores, jnp.asarray(mask))
    rv, ri = jax.lax.top_k(sm, k)
    sent = np.iinfo(np.int32).max // 2
    ri = jnp.where(jnp.isneginf(rv), sent, ri)
    return np.asarray(hits_against_padded_truth(ri, jnp.asarray(test)))


def _dot_rank_hits(uv, items, bias, mask, test, k):
    from skrx.ops.pallas import dot_topk_ranks
    ranks = dot_topk_ranks(jnp.asarray(uv), jnp.asarray(items),
                           jnp.asarray(bias), k, jnp.asarray(test),
                           mask_table=jnp.asarray(mask), interpret=True)
    return np.asarray(jnp.any(
        ranks[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :],
        axis=1).astype(jnp.float32))


@pytest.mark.parametrize("seed,n", [(0, 8192), (1, 5000)])
def test_dot_topk_ranks_matches_oracle(seed, n):
    # n=5000 exercises catalog padding: pad columns score -inf through the
    # bias and must never look up as finite
    rs = np.random.RandomState(seed)
    b, d, k, L, T = 12, 24, 50, 16, 8
    uv = rs.randn(b, d).astype(np.float32)
    items = rs.randn(n, d).astype(np.float32)
    bias = rs.randn(n).astype(np.float32) * 0.1
    mask = rs.randint(0, n, (b, L)).astype(np.int32)
    test = rs.randint(0, n, (b, T)).astype(np.int32)
    test[:, 0] = mask[:, 0]          # masked test item: never hits
    test[:, 1] = n                   # pad id: never hits
    np.testing.assert_array_equal(
        _dot_rank_hits(uv, items, bias, mask, test, k),
        _dot_oracle_hits(uv, items, bias, mask, test, k))


def test_dot_topk_ranks_duplicate_item_rows_tie():
    # duplicated item rows produce EXACTLY equal scores; the rank path
    # must separate the two test items by id, same as the sorted merge
    rs = np.random.RandomState(2)
    b, n, d, k = 6, 8192, 16, 10
    uv = rs.randn(b, d).astype(np.float32)
    items = rs.randn(n, d).astype(np.float32)
    items[4000] = items[7]           # exact duplicate
    items[7] *= 3.0                  # make it rank high
    items[4000] = items[7]
    bias = np.zeros(n, np.float32)
    mask = np.full((b, 4), n, np.int32)
    test = np.tile(np.array([7, 4000], np.int32), (b, 1))
    got = _dot_rank_hits(uv, items, bias, mask, test, k)
    ref = _dot_oracle_hits(uv, items, bias, mask, test, k)
    np.testing.assert_array_equal(got, ref)
