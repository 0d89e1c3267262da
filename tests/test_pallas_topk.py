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


# ---- width-chunked merge path (W > _MERGE_CHUNK_W = 8192) ----
# Regression coverage for merge_topk's chunk loop, pruned_merge's tau-pruned
# chunk rows, chunk-boundary tie-breaking, and cross-chunk duplicate
# (value, id) dedup — previously exercised only at 1M-item scale in scripts.

def _oracle_merge(vals, ids, k):
    """(value desc, id asc) top-k with duplicate (value, id) pairs collapsed
    — the documented merge_topk contract."""
    out_v = np.empty((vals.shape[0], k), np.float32)
    out_i = np.empty((vals.shape[0], k), np.int32)
    for r in range(vals.shape[0]):
        pairs = sorted(set(zip(vals[r].tolist(), ids[r].tolist())),
                       key=lambda p: (-p[0], p[1]))[:k]
        out_v[r] = [p[0] for p in pairs]
        out_i[r] = [p[1] for p in pairs]
    return out_v, out_i


def test_merge_topk_wide_chunked():
    """W=20000 drives the chunk loop (3 chunks incl. a padded tail)."""
    from skrx.ops.pallas.topk_blocks import _MERGE_CHUNK_W, merge_topk

    w, k = 20000, 50
    assert w > 2 * _MERGE_CHUNK_W
    rng = np.random.default_rng(5)
    vals = rng.standard_normal((6, w)).astype(np.float32)
    ids = np.stack([rng.permutation(w).astype(np.int32) for _ in range(6)])
    v, i = merge_topk(jnp.asarray(vals), jnp.asarray(ids), k, interpret=True)
    ref_v, ref_i = _oracle_merge(vals, ids, k)
    np.testing.assert_allclose(np.asarray(v), ref_v)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_merge_topk_wide_tau_pruned():
    """Same width through the tau-pruned chunk rows (pruned_merge level)."""
    from skrx.ops.pallas.topk_blocks import (_MERGE_CHUNK_W, _PRUNED_MIN_W,
                                             merge_topk)

    w, k = 20000, 37
    assert w > 2 * _MERGE_CHUNK_W and _MERGE_CHUNK_W > _PRUNED_MIN_W
    rng = np.random.default_rng(6)
    vals = rng.standard_normal((6, w)).astype(np.float32)
    ids = np.stack([rng.permutation(w).astype(np.int32) for _ in range(6)])
    tau = np.sort(vals, axis=1)[:, -k]     # exact per-row k-th largest
    v, i = merge_topk(jnp.asarray(vals), jnp.asarray(ids), k,
                      tau=jnp.asarray(tau), interpret=True)
    ref_v, ref_i = _oracle_merge(vals, ids, k)
    np.testing.assert_allclose(np.asarray(v), ref_v)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_merge_topk_chunk_boundary_tie_storm():
    """Identical values straddling the 8192 chunk boundary (and duplicated
    across chunks) must still break toward the smallest id globally."""
    from skrx.ops.pallas.topk_blocks import _MERGE_CHUNK_W, merge_topk

    w, k = 2 * _MERGE_CHUNK_W + 600, 20
    vals = np.zeros((3, w), np.float32)
    ids = np.broadcast_to(np.arange(w, dtype=np.int32), (3, w)).copy()
    cb = _MERGE_CHUNK_W
    # tie storm: value 5.0 on both sides of both chunk boundaries, with ids
    # REVERSED around the first boundary so id-asc must cross chunks
    storm = list(range(cb - 8, cb + 8)) + list(range(2 * cb - 4, 2 * cb + 4))
    vals[:, storm] = 5.0
    ids[:, cb - 8: cb + 8] = ids[:, cb - 8: cb + 8][:, ::-1]
    # a second tie level filling the remaining slots, all inside one chunk
    vals[:, 100:110] = 3.0
    v, i = merge_topk(jnp.asarray(vals), jnp.asarray(ids), k, interpret=True)
    ref_v, ref_i = _oracle_merge(vals, ids, k)
    np.testing.assert_allclose(np.asarray(v), ref_v)
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_merge_topk_duplicate_value_id_across_chunks():
    """The same (value, id) candidate appearing in different chunks must
    collapse to ONE output slot (the documented dedup rule)."""
    from skrx.ops.pallas.topk_blocks import _MERGE_CHUNK_W, merge_topk

    w, k = 2 * _MERGE_CHUNK_W + 100, 8
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1.0, 0.0, (4, w)).astype(np.float32)
    ids = np.broadcast_to(np.arange(w, dtype=np.int32), (4, w)).copy()
    # duplicate the global winner (9.0, id 77) into all three chunks
    for col in (77, _MERGE_CHUNK_W + 5, 2 * _MERGE_CHUNK_W + 5):
        vals[:, col] = 9.0
        ids[:, col] = 77
    # and a second duplicated pair that must also appear exactly once
    for col in (500, _MERGE_CHUNK_W + 600):
        vals[:, col] = 8.0
        ids[:, col] = 500
    v, i = merge_topk(jnp.asarray(vals), jnp.asarray(ids), k, interpret=True)
    ref_v, ref_i = _oracle_merge(vals, ids, k)
    np.testing.assert_allclose(np.asarray(v), ref_v)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    assert (np.asarray(i) == 77).sum(axis=1).max() == 1


def test_blockwise_topk_wide_chunked_merge():
    """blockwise_topk at n=30000, block_n=512: the candidate matrix
    (59 blocks x cand_w) exceeds _MERGE_CHUNK_W, driving the chunked merge
    inside the public entry point."""
    from skrx.ops.pallas.topk_blocks import _MERGE_CHUNK_W, GROUP_ROUNDS

    n, k, block_n = 30000, 17, 512
    n_blocks = -(-n // block_n)
    cand_w = GROUP_ROUNDS * 128 + 128      # k_eff = 128 at k=17
    assert n_blocks * cand_w > _MERGE_CHUNK_W
    rng = np.random.default_rng(8)
    scores = rng.standard_normal((4, n)).astype(np.float32)
    scores[1, :] = 0.25                    # full-row tie storm across blocks
    v, i = blockwise_topk(jnp.asarray(scores), k, block_n=block_n,
                          interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
