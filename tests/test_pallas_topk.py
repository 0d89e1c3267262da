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


@pytest.mark.parametrize("n,block_n,L", [(1000, 256, 40), (520, 128, 7),
                                         (130, 128, 4)])
def test_blockwise_topk_fused_mask(n, block_n, L):
    """Fused train-item masking == mask_items + lax.top_k, exactly."""
    from skrx.ops.metrics import mask_items

    rng = np.random.default_rng(3)
    scores = rng.standard_normal((8, n)).astype(np.float32)
    # sorted per-row tables with pad entries (pad id == n)
    table = np.full((8, L), n, dtype=np.int32)
    for r in range(8):
        cnt = rng.integers(1, L + 1)
        table[r, :cnt] = np.sort(rng.permutation(n)[:cnt])
    vals, idx = blockwise_topk(jnp.asarray(scores), 17, block_n=block_n,
                               interpret=True, mask_table=jnp.asarray(table))
    ref_vals, ref_idx = jax.lax.top_k(
        mask_items(jnp.asarray(scores), jnp.asarray(table)), 17)
    # reference yields -inf entries for masked items when fewer than k
    # survive; the kernel pads those slots with sentinel indices instead,
    # so compare only the finite prefix
    ref_vals = np.asarray(ref_vals)
    finite = np.isfinite(ref_vals)
    np.testing.assert_allclose(np.asarray(vals)[finite], ref_vals[finite])
    np.testing.assert_array_equal(np.asarray(idx)[finite],
                                  np.asarray(ref_idx)[finite])
    assert not np.isfinite(np.asarray(vals)[~finite]).any()


def test_blockwise_topk_mask_train_dominates():
    """Trained-model regime: train items hold the global top scores."""
    from skrx.ops.metrics import mask_items

    rng = np.random.default_rng(9)
    n, L, k = 2000, 64, 10
    scores = rng.standard_normal((4, n)).astype(np.float32)
    table = np.stack([np.sort(rng.permutation(n)[:L]) for _ in range(4)])
    for r in range(4):
        scores[r, table[r]] += 50.0  # train items dominate every block
    vals, idx = blockwise_topk(jnp.asarray(scores), k, block_n=256,
                               interpret=True, mask_table=jnp.asarray(table))
    ref_vals, ref_idx = jax.lax.top_k(
        mask_items(jnp.asarray(scores), jnp.asarray(table)), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_blockwise_topk_batch_tiling():
    """B > block_b exercises the batch grid axis (incl. a ragged last tile)."""
    rng = np.random.default_rng(5)
    scores = rng.standard_normal((11, 520)).astype(np.float32)
    vals, idx = blockwise_topk(jnp.asarray(scores), 9, block_n=128,
                               block_b=4, interpret=True)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), 9)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_blockwise_topk_tie_storm():
    """Constant rows give every block a full-k tie storm; extraction must
    still match lax.top_k's lowest-index tie-breaking exactly."""
    scores = np.zeros((4, 1024), dtype=np.float32)
    scores[:, 700] = 2.0
    vals, idx = blockwise_topk(jnp.asarray(scores), 7, block_n=128,
                               interpret=True)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), 7)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_blockwise_topk_masked_batch_tiling():
    """Mask + batch tiling together, with sub-slice mask unpack."""
    from skrx.ops.metrics import mask_items

    rng = np.random.default_rng(7)
    scores = rng.standard_normal((10, 768)).astype(np.float32)
    table = np.full((10, 12), 768, dtype=np.int32)
    for r in range(10):
        cnt = rng.integers(1, 13)
        table[r, :cnt] = np.sort(rng.permutation(768)[:cnt])
    vals, idx = blockwise_topk(jnp.asarray(scores), 17, block_n=256,
                               block_b=4, interpret=True,
                               mask_table=jnp.asarray(table))
    ref_vals, ref_idx = jax.lax.top_k(
        mask_items(jnp.asarray(scores), jnp.asarray(table)), 17)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_vmem_topk_matches_lax():
    """vmem_topk with a row iota == lax.top_k exactly (incl. tie rule)."""
    from skrx.ops.pallas import vmem_topk

    rng = np.random.default_rng(11)
    vals = rng.standard_normal((9, 300)).astype(np.float32)
    vals[2, :] = 0.0                       # full-row tie storm
    vals[4, 10] = vals[4, 200] = 7.0       # two-way tie
    iota = np.broadcast_to(np.arange(300, dtype=np.int32), (9, 300))
    v, i = vmem_topk(jnp.asarray(vals), jnp.asarray(iota.copy()), 17,
                     interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(vals), 17)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_vmem_topk_carries_global_ids():
    """Ids ride through the selection; ties break on the id VALUE."""
    from skrx.ops.pallas import vmem_topk

    vals = np.array([[1.0, 3.0, 3.0, 2.0]], np.float32)
    ids = np.array([[70, 50, 20, 60]], np.int32)
    v, i = vmem_topk(jnp.asarray(vals), jnp.asarray(ids), 3, interpret=True)
    np.testing.assert_allclose(np.asarray(v)[0], [3.0, 3.0, 2.0])
    np.testing.assert_array_equal(np.asarray(i)[0], [20, 50, 60])
