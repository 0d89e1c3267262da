import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import scipy.sparse as sp

from skrx.ops.graph_bucketed import bucketed_from_sp_matrix, propagate_bucketed


@pytest.mark.parametrize("seed", [0, 1])
def test_bucketed_matches_spmm_and_transpose_grad(seed):
    rng = np.random.default_rng(seed)
    n, d = 150, 8
    dense = (rng.random((n, n)) < 0.06) * rng.random((n, n))
    mat = sp.csr_matrix(dense.astype(np.float32))
    g = bucketed_from_sp_matrix(mat, caps=(4, 16, 64))
    x = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(propagate_bucketed(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, mat @ x, rtol=1e-4, atol=1e-5)

    ct = rng.standard_normal((n, d)).astype(np.float32)
    grad = jax.grad(lambda xx: jnp.sum(propagate_bucketed(g, xx)
                                       * jnp.asarray(ct)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), mat.T @ ct, rtol=1e-4,
                               atol=1e-5)


def test_bucketed_isolated_nodes():
    # single edge 0 -> 1 with weight 2; all other nodes isolated
    mat = sp.csr_matrix((np.array([2.0], np.float32),
                         (np.array([0]), np.array([1]))), shape=(10, 10))
    g = bucketed_from_sp_matrix(mat)
    x = jnp.ones((10, 4))
    out = np.asarray(propagate_bucketed(g, x))
    expected = np.zeros((10, 4)); expected[0] = 2.0
    np.testing.assert_allclose(out, expected)
