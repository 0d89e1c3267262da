import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import scipy.sparse as sp

from skrx.ops import (bpr_loss, l2_loss, sigmoid_cross_entropy, square_loss,
                      hinge_loss, top1_loss, bpr_max_loss, info_nce_loss,
                      inner_product, euclidean_distance, get_initializer,
                      Graph, graph_from_sp_matrix, propagate, propagate_layers,
                      edge_dropout)


def test_losses_against_numpy():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal(32).astype(np.float32)
    neg = rng.standard_normal(32).astype(np.float32)

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    np.testing.assert_allclose(np.asarray(bpr_loss(jnp.asarray(pos), jnp.asarray(neg))),
                               -np.log(sigmoid(pos - neg)), rtol=5e-4,
                               atol=5e-5)
    w = rng.standard_normal((4, 5)).astype(np.float32)
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(w))),
                               0.5 * (w ** 2).sum(), rtol=1e-5)
    y = rng.standard_normal(16).astype(np.float32)
    t = (rng.random(16) > 0.5).astype(np.float32)
    expected = np.maximum(y, 0) - y * t + np.log1p(np.exp(-np.abs(y)))
    np.testing.assert_allclose(np.asarray(sigmoid_cross_entropy(jnp.asarray(y), jnp.asarray(t))),
                               expected, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(square_loss(jnp.asarray(y), 1.0)),
                               (y - 1.0) ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hinge_loss(jnp.asarray(pos), jnp.asarray(neg), 0.5)),
                               np.maximum(0, 0.5 - (pos - neg)), rtol=1e-5)


def test_top1_and_bprmax_shapes():
    pos = jnp.ones(8)
    neg = jnp.zeros((8, 5))
    assert top1_loss(pos, neg).shape == (8,)
    assert bpr_max_loss(pos, neg, reg=0.1).shape == (8,)
    # perfect separation => low loss
    assert float(bpr_max_loss(jnp.full(4, 10.0), jnp.full((4, 3), -10.0)).mean()) < 1e-3


def test_info_nce_in_batch():
    a = jnp.eye(4, 8)
    loss = info_nce_loss(a, a, temperature=0.1)
    assert loss.shape == (4,)
    # identical pairs on distinct rows => near-zero loss
    assert float(loss.mean()) < 0.05


def test_distance_helpers():
    a = jnp.asarray([[3.0, 0.0]])
    b = jnp.asarray([[0.0, 4.0]])
    np.testing.assert_allclose(float(inner_product(a, b)[0]), 0.0)
    np.testing.assert_allclose(float(euclidean_distance(a, b)[0]), 5.0, rtol=1e-5)


def test_initializers():
    key = jax.random.key(0)
    for name in ("normal", "truncated_normal", "uniform", "he_normal",
                 "he_uniform", "xavier_normal", "xavier_uniform", "zeros",
                 "ones"):
        x = get_initializer(name)(key, (64, 32))
        assert x.shape == (64, 32)
    u = np.asarray(get_initializer("uniform")(key, (10000,)))
    assert u.min() >= -0.05 and u.max() <= 0.05
    n = np.asarray(get_initializer("normal")(key, (10000,)))
    assert abs(n.std() - 0.01) < 0.002
    t = np.asarray(get_initializer("truncated_normal")(key, (10000,)))
    assert np.abs(t).max() <= 0.02 + 1e-6
    with pytest.raises(ValueError):
        get_initializer("bogus")


def test_graph_propagate_matches_spmm():
    rng = np.random.default_rng(1)
    n = 30
    dense = (rng.random((n, n)) < 0.1) * rng.random((n, n))
    mat = sp.csr_matrix(dense)
    g = graph_from_sp_matrix(mat)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    got = np.asarray(propagate(g, jnp.asarray(x)))
    expected = mat @ x
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_propagate_layers_mean():
    n = 10
    mat = sp.eye(n, format="csr") * 2.0
    g = graph_from_sp_matrix(mat)
    x = np.ones((n, 3), dtype=np.float32)
    out = np.asarray(propagate_layers(g, jnp.asarray(x), num_layers=2,
                                      combine="mean"))
    # layers: x, 2x, 4x -> mean = 7/3 x
    np.testing.assert_allclose(out, np.full((n, 3), 7.0 / 3.0), rtol=1e-5)


def test_edge_dropout_scaling():
    mask = np.asarray(edge_dropout(jax.random.key(0), 100000, 0.8))
    assert set(np.unique(mask)).issubset({0.0, np.float32(1 / 0.8)})
    np.testing.assert_allclose(mask.mean(), 1.0, atol=0.02)
    with pytest.raises(ValueError):
        edge_dropout(jax.random.key(0), 10, 0.0)
