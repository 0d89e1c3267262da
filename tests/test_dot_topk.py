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
