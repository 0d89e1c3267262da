"""Native C++ kernels vs the NumPy/C++ metric oracle and device kernels."""
import numpy as np
import pytest

from skrx.native import (available, batch_sample_negatives_native,
                         eval_score_matrix_native, top_k_native)
from .oracle import eval_score_matrix_oracle

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")

ALL_METRICS = (1, 2, 3, 4, 5)


def test_native_eval_matches_oracle():
    rng = np.random.default_rng(0)
    b, n, k = 12, 150, 20
    scores = rng.standard_normal((b, n)).astype(np.float32)
    test_items, train_items = [], []
    for _ in range(b):
        perm = rng.permutation(n)
        test_items.append(perm[:5])
        train_items.append(perm[5:25])
    oracle = eval_score_matrix_oracle(scores, test_items, train_items,
                                      ALL_METRICS, k)
    got = eval_score_matrix_native(scores, test_items, ALL_METRICS, k,
                                   thread_num=4, train_items=train_items)
    np.testing.assert_allclose(got.reshape(b, len(ALL_METRICS), k), oracle,
                               rtol=1e-5, atol=1e-6)


def test_native_eval_matches_device_kernel():
    import jax.numpy as jnp
    from skrx.ops import eval_score_matrix_device

    rng = np.random.default_rng(1)
    b, n, k = 8, 100, 10
    scores = rng.standard_normal((b, n)).astype(np.float32)
    test_items = [rng.permutation(n)[:4] for _ in range(b)]
    native = eval_score_matrix_native(scores, test_items, ALL_METRICS, k,
                                      thread_num=2)
    table = np.full((b, 4), n, np.int32)
    for i, t in enumerate(test_items):
        table[i, : len(t)] = t
    device = eval_score_matrix_device(
        jnp.asarray(scores), jnp.full((b, 1), n, np.int32),
        jnp.asarray(table), jnp.full(b, 4, np.int32), ALL_METRICS, k)
    np.testing.assert_allclose(native.reshape(b, len(ALL_METRICS), k),
                               np.asarray(device), rtol=1e-4, atol=1e-5)


def test_native_sampler():
    excl = [[0, 1, 2], [5, 6], []]
    res = batch_sample_negatives_native(10, [100, 50, 20], excl, seed=7)
    assert len(res) == 3
    assert len(res[0]) == 100
    assert not np.isin(res[0], excl[0]).any()
    assert not np.isin(res[1], excl[1]).any()
    assert res[2].min() >= 0 and res[2].max() < 10
    # deterministic for a fixed seed
    res2 = batch_sample_negatives_native(10, [100, 50, 20], excl, seed=7)
    np.testing.assert_array_equal(res[0], res2[0])


def test_native_topk():
    rng = np.random.default_rng(3)
    scores = rng.standard_normal((5, 40)).astype(np.float32)
    vals, idx = top_k_native(scores, 7)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(vals, np.take_along_axis(scores, order, axis=1))


def test_native_sort_and_argsort():
    from skrx.native import arg_sort_native, sort_native

    rng = np.random.default_rng(4)
    # 2D float, both directions
    x = rng.standard_normal((6, 33)).astype(np.float32)
    np.testing.assert_array_equal(sort_native(x), np.sort(x, axis=1))
    np.testing.assert_array_equal(sort_native(x, descending=True),
                                  -np.sort(-x, axis=1))
    np.testing.assert_array_equal(arg_sort_native(x),
                                  np.argsort(x, axis=1, kind="stable"))
    np.testing.assert_array_equal(arg_sort_native(x, descending=True),
                                  np.argsort(-x, axis=1, kind="stable"))
    # 1D int with ties (stability: lower index first)
    y = np.array([3, 1, 3, 2, 1, 3], dtype=np.int32)
    np.testing.assert_array_equal(sort_native(y), np.sort(y))
    np.testing.assert_array_equal(arg_sort_native(y),
                                  np.argsort(y, kind="stable"))
    np.testing.assert_array_equal(arg_sort_native(y, descending=True),
                                  np.argsort(-y, kind="stable"))
