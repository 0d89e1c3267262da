import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx.ops import (is_member_sorted, sample_negatives,
                      sample_negatives_weighted,
                      gumbel_topk_without_replacement)


def _pos_table(user_pos, num_users, num_items):
    max_pos = max(len(v) for v in user_pos.values())
    table = np.full((num_users, max_pos), num_items, dtype=np.int32)
    for u, items in user_pos.items():
        table[u, : len(items)] = np.sort(items)
    return jnp.asarray(table)


def test_is_member_sorted():
    rows = jnp.asarray(np.array([[1, 3, 5, 9], [2, 2, 2, 2]], dtype=np.int32))
    q = jnp.asarray(np.array([[1, 2, 9, 10], [2, 3, 0, 2]], dtype=np.int32))
    got = np.asarray(is_member_sorted(rows, q))
    np.testing.assert_array_equal(got, [[True, False, True, False],
                                        [True, False, False, True]])


def test_sample_negatives_excludes_positives():
    num_users, num_items = 20, 50
    rng = np.random.default_rng(0)
    user_pos = {u: rng.choice(num_items, size=rng.integers(1, 20),
                              replace=False) for u in range(num_users)}
    table = _pos_table(user_pos, num_users, num_items)
    users = jnp.asarray(np.repeat(np.arange(num_users), 10).astype(np.int32))
    neg = np.asarray(sample_negatives(jax.random.key(1), users, table,
                                      num_items, num_neg=3))
    assert neg.shape == (200, 3)
    assert neg.min() >= 0 and neg.max() < num_items
    for u, row in zip(np.asarray(users), neg):
        assert not np.isin(row, user_pos[int(u)]).any()


def test_sample_negatives_uniform_coverage():
    """Distribution sanity: each allowed item gets ~uniform mass."""
    num_items = 20
    table = jnp.asarray(np.array([[0, 1, 2, 3, num_items]], dtype=np.int32))
    users = jnp.zeros(20000, dtype=jnp.int32)
    neg = np.asarray(sample_negatives(jax.random.key(2), users, table,
                                      num_items, num_neg=1)).ravel()
    counts = np.bincount(neg, minlength=num_items)
    assert (counts[:4] == 0).all()
    allowed = counts[4:]
    expected = len(neg) / 16
    assert (np.abs(allowed - expected) < 5 * np.sqrt(expected)).all()


def test_sample_negatives_weighted():
    num_items = 10
    table = jnp.asarray(np.array([[0, num_items]], dtype=np.int32))
    log_w = jnp.asarray(np.log(np.arange(1, num_items + 1, dtype=np.float32)))
    users = jnp.zeros(5000, dtype=jnp.int32)
    neg = np.asarray(sample_negatives_weighted(jax.random.key(3), users, table,
                                               log_w, num_neg=1)).ravel()
    assert (neg != 0).all()
    counts = np.bincount(neg, minlength=num_items).astype(float)
    # heavier items sampled more
    assert counts[9] > counts[1] * 2


def test_gumbel_topk_without_replacement():
    log_w = jnp.asarray(np.zeros(100, dtype=np.float32))
    idx = np.asarray(gumbel_topk_without_replacement(jax.random.key(4), log_w, 30))
    assert len(np.unique(idx)) == 30
    # strongly weighted element almost always selected
    log_w2 = log_w.at[7].set(20.0)
    hits = 0
    for s in range(20):
        idx2 = np.asarray(gumbel_topk_without_replacement(jax.random.key(s), log_w2, 5))
        hits += 7 in idx2
    assert hits == 20
