import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx.ops.pallas import blockwise_topk


@pytest.mark.parametrize("n,block_n", [(1000, 256), (512, 128), (130, 128)])
def test_blockwise_topk_matches_lax(n, block_n):
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((8, n)).astype(np.float32)
    vals, idx = blockwise_topk(jnp.asarray(scores), 17, block_n=block_n,
                               interpret=True)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), 17)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_blockwise_topk_with_ties():
    scores = np.zeros((4, 600), dtype=np.float32)
    scores[:, 300] = 1.0
    vals, idx = blockwise_topk(jnp.asarray(scores), 5, block_n=128,
                               interpret=True)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), 5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
