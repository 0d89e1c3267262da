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


# ---------------------------------------------------------------- round 5:
# bisection tau (kth_largest) + the merge-free rank-counting eval path


def _oracle_hits(scores, mask_table, test_table, k):
    """Reference hit matrix: masked lax.top_k ids vs truth ids — the exact
    construction eval_score_matrix_device's XLA path uses, with the
    repo's -inf-slot contract (slots with -inf values never hit)."""
    from skrx.ops.metrics import hits_against_padded_truth, mask_items
    s = mask_items(jnp.asarray(scores), jnp.asarray(mask_table))
    vals, idx = jax.lax.top_k(s, k)
    sent = np.iinfo(np.int32).max // 2
    idx = jnp.where(jnp.isneginf(vals), sent, idx)
    return np.asarray(
        hits_against_padded_truth(idx, jnp.asarray(test_table)))


def _rank_hits(scores, mask_table, test_table, k, **kw):
    from skrx.ops.pallas import masked_topk_ranks
    ranks = masked_topk_ranks(jnp.asarray(scores), k,
                              jnp.asarray(test_table),
                              mask_table=jnp.asarray(mask_table),
                              interpret=True, **kw)
    return np.asarray(jnp.any(
        ranks[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :],
        axis=1).astype(jnp.float32))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kth_largest_matches_numpy(seed):
    from skrx.ops.pallas import kth_largest
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((16, 4096)).astype(np.float32)
    # inject ties, -infs, negatives-only rows, and a fully -inf row
    x[1] = np.round(x[1] * 2)
    x[2, 100:] = -np.inf
    x[3] = -np.abs(x[3]) - 1.0
    x[4] = -np.inf
    for k in (1, 7, 50, 128):
        got = np.asarray(kth_largest(jnp.asarray(x), k, interpret=True))
        ref = np.sort(x, axis=1)[:, -k]
        np.testing.assert_array_equal(got[:, 0], ref)
        # lane-broadcast layout
        np.testing.assert_array_equal(got, np.broadcast_to(got[:, :1],
                                                           got.shape))


def test_kth_largest_subnormals_and_zeros():
    from skrx.ops.pallas import kth_largest
    x = np.zeros((8, 256), np.float32)
    x[0, :5] = [-0.0, 0.0, 1e-40, -1e-40, 5e-324]  # signed zeros/subnormals
    x[1] = -0.0
    got = np.asarray(kth_largest(jnp.asarray(x), 3, interpret=True))[:, 0]
    ref = np.sort(x, axis=1)[:, -3]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed,L,T", [(0, 16, 4), (1, 64, 16), (2, 8, 1)])
def test_rank_hits_match_topk_hits_random(seed, L, T):
    rng = np.random.default_rng(seed)
    b, n, k = 16, 8192, 50
    scores = rng.standard_normal((b, n)).astype(np.float32)
    mask = rng.integers(0, n, size=(b, L)).astype(np.int32)
    test = rng.integers(0, n, size=(b, T)).astype(np.int32)
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_tie_storm_and_quantized():
    rng = np.random.default_rng(3)
    b, n, k = 8, 8192, 50
    # heavy ties: integer-quantized scores plus a constant row
    scores = rng.integers(0, 5, size=(b, n)).astype(np.float32)
    scores[0] = 1.0
    mask = rng.integers(0, n, size=(b, 16)).astype(np.int32)
    test = rng.integers(0, n, size=(b, 8)).astype(np.int32)
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_popularity_clustered_top():
    # adversarial for group-wise extraction: ALL top scores sit in the
    # first 128 adjacent columns (popularity-remapped id layout), so the
    # stage-B while loop does real work
    rng = np.random.default_rng(4)
    b, n, k = 8, 16384, 50
    scores = rng.standard_normal((b, n)).astype(np.float32)
    scores[:, :128] += 100.0
    mask = rng.integers(0, 200, size=(b, 32)).astype(np.int32)
    test = np.concatenate([rng.integers(0, 128, size=(b, 8)),
                           rng.integers(0, n, size=(b, 8))],
                          axis=1).astype(np.int32)
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_sparse_masked_and_invalid_test_items():
    b, n, k = 8, 8192, 50
    rng = np.random.default_rng(5)
    scores = np.full((b, n), -np.inf, np.float32)
    scores[:, :40] = rng.standard_normal((b, 40))  # < k finite entries
    mask = np.full((b, 8), 0, np.int32)
    mask[:, 1] = 3
    test = np.zeros((b, 6), np.int32)
    test[:, 0] = 5          # finite, maybe top
    test[:, 1] = 3          # masked -> never hits
    test[:, 2] = n          # out of range (pad id) -> never hits
    test[:, 3] = 1000       # -inf score -> never hits
    test[:, 4] = 0          # masked (id 0) -> never hits
    test[:, 5] = 7
    got = _rank_hits(scores, mask, test, k)
    ref = _oracle_hits(scores, mask, test, k)
    np.testing.assert_array_equal(got, ref)
    # explicit: the masked/-inf/oob items produced no hit anywhere
    assert got.sum() <= 2 * b


def test_rank_hits_two_test_items_tied_scores():
    # two test items with EXACTLY equal scores: lex rank must separate
    # them by id, producing two distinct hit positions
    b, n, k = 4, 8192, 10
    scores = np.zeros((b, n), np.float32)
    scores[:, 10] = 5.0
    scores[:, 4000] = 5.0
    scores[:, 7000] = 6.0
    mask = np.full((b, 4), n, np.int32)  # no masking (pad ids)
    test = np.tile(np.array([10, 4000], np.int32), (b, 1))
    got = _rank_hits(scores, mask, test, k)
    ref = _oracle_hits(scores, mask, test, k)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got[:, 1], np.ones(b))  # rank 1
    np.testing.assert_array_equal(got[:, 2], np.ones(b))  # rank 2


def test_eval_score_matrix_device_rank_path_matches_xla(monkeypatch):
    """The production wiring (eval_score_matrix_device's Pallas branch)
    against its own XLA branch, on the CPU interpret path."""
    from skrx.ops import metrics as M

    rng = np.random.default_rng(6)
    b, n, k = 12, 8192, 20
    scores = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    train = jnp.asarray(rng.integers(0, n, size=(b, 24)).astype(np.int32))
    test = jnp.asarray(rng.integers(0, n, size=(b, 6)).astype(np.int32))
    tlen = jnp.full((b,), 6, jnp.int32)
    ids = (1, 2, 4, 5)

    ref = M.eval_score_matrix_device(scores, train, test, tlen, ids, k,
                                     use_pallas=False)

    monkeypatch.setattr(M, "_use_blockwise", lambda n_, k_: True)
    import skrx.ops.pallas.topk_blocks as tb
    real = tb.masked_topk_ranks

    def interp(scores, k, test_table, mask_table=None, **kw):
        kw.pop("interpret", None)
        return real(scores, k, test_table, mask_table=mask_table,
                    interpret=True, **kw)

    monkeypatch.setattr(tb, "masked_topk_ranks", interp)
    import skrx.ops.pallas as P
    monkeypatch.setattr(P, "masked_topk_ranks", interp)
    got = M.eval_score_matrix_device(scores, train, test, tlen, ids, k,
                                     use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


# ----------------------------------------------------- round 5: one-pass
# rank counting (stage-A-only kernel + per-column rescue + fallback)


def test_rank_hits_group_overflow_forces_rescue():
    # 6 of the global top-10 share ONE stride-128 group (ids 0, 128, ...,
    # 640 in block 0) — more than ONEPASS_ROUNDS, so the one-pass kernel
    # cannot emit them all and the residual-max flag must trigger the
    # per-column rescue for an exact count
    b, n, k = 8, 16384, 10
    rng = np.random.default_rng(7)
    scores = rng.standard_normal((b, n)).astype(np.float32)
    group_ids = np.array([0, 128, 256, 384, 512, 640])
    scores[:, group_ids] = 50.0 + np.arange(6)[::-1]
    mask = np.full((b, 4), n, np.int32)
    test = np.tile(np.concatenate([group_ids[:4], [3, 77]]).astype(np.int32),
                   (b, 1))
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_two_clustered_columns():
    # clusters in TWO different block columns: both must be rescued
    b, n, k = 8, 16384, 20
    rng = np.random.default_rng(8)
    scores = rng.standard_normal((b, n)).astype(np.float32)
    g0 = np.array([0, 128, 256, 384, 512])          # block 0, group 0
    g1 = 4096 + np.array([7, 135, 263, 391, 519])   # block 1, group 7
    scores[:, g0] = 60.0
    scores[:, g1] = 55.0
    mask = np.full((b, 4), n, np.int32)
    test = np.tile(np.concatenate([g0[:3], g1[:3]]).astype(np.int32), (b, 1))
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_constant_scores_overflow_fallback():
    # constant scores flag EVERY column (every residual group max equals
    # tau) -> more than _RESCUE_MAX_COLS -> the two-pass fallback must
    # produce the exact index-ordered ranking
    b, n, k = 4, 16384, 10
    scores = np.ones((b, n), np.float32)
    mask = np.zeros((b, 3), np.int32)
    mask[:] = [0, 1, 2]
    test = np.tile(np.array([1, 3, 4, 500, 12000], np.int32), (b, 1))
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_rescued_column_with_masked_elements():
    # rescue recount must apply the packed mask: cluster in block 0 where
    # half the cluster is ALSO masked out
    b, n, k = 8, 16384, 10
    rng = np.random.default_rng(9)
    scores = rng.standard_normal((b, n)).astype(np.float32)
    group_ids = np.arange(6) * 128
    scores[:, group_ids] = 50.0
    mask = np.tile(group_ids[:3].astype(np.int32), (b, 1))   # mask 3 of 6
    test = np.tile(group_ids[2:6].astype(np.int32), (b, 1))
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


def test_rank_hits_wide_truth_table_xla_path():
    # T > 128 routes through the two-pass + XLA broadcast-reduce branch
    b, n, k = 4, 8192, 50
    rng = np.random.default_rng(10)
    scores = rng.standard_normal((b, n)).astype(np.float32)
    mask = rng.integers(0, n, size=(b, 8)).astype(np.int32)
    test = rng.integers(0, n, size=(b, 140)).astype(np.int32)
    np.testing.assert_array_equal(_rank_hits(scores, mask, test, k),
                                  _oracle_hits(scores, mask, test, k))


# ------------------------------------------- round 5: small-catalog direct
# rank counting (masked_topk_ranks_small — the ML-100k/ML-1M regime)


def _small_rank_hits(scores, mask, test, k):
    from skrx.ops.pallas import masked_topk_ranks_small
    ranks = masked_topk_ranks_small(jnp.asarray(scores), k,
                                    jnp.asarray(test),
                                    mask_table=jnp.asarray(mask),
                                    interpret=True)
    return np.asarray(jnp.any(
        ranks[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :],
        axis=1).astype(jnp.float32))


@pytest.mark.parametrize("n,variant,seed", [(1682, "rand", 21),
                                            (3706, "ties", 22),
                                            (150, "tiny", 23),
                                            (2048, "sparse", 24)])
def test_small_rank_hits_match_topk_hits(n, variant, seed):
    rng = np.random.default_rng(seed)
    b, k, L, T = 16, 50, 16, 6
    scores = rng.standard_normal((b, n)).astype(np.float32)
    if variant == "ties":
        scores = np.round(scores)
    if variant == "sparse":
        scores[:] = -np.inf
        scores[:, :10] = rng.standard_normal((b, 10))
    mask = rng.integers(0, n, size=(b, L)).astype(np.int32)
    test = rng.integers(0, n, size=(b, T)).astype(np.int32)
    test[:, 0] = mask[:, 0]      # masked -> never hits
    test[:, -1] = n              # pad id -> never hits
    got = _small_rank_hits(scores, mask, test, k)
    ref = _oracle_hits(scores, mask, test, min(k, n))
    if ref.shape[1] < k:         # catalog smaller than the cutoff
        ref = np.pad(ref, ((0, 0), (0, k - ref.shape[1])))
    np.testing.assert_array_equal(got, ref)


def test_eval_score_matrix_device_small_path_matches_xla(monkeypatch):
    """Production wiring of the small-catalog branch vs the XLA branch."""
    from skrx.ops import metrics as M

    rng = np.random.default_rng(11)
    b, n, k = 10, 1700, 20
    scores = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    train = jnp.asarray(rng.integers(0, n, size=(b, 20)).astype(np.int32))
    test = jnp.asarray(rng.integers(0, n, size=(b, 5)).astype(np.int32))
    tlen = jnp.full((b,), 5, jnp.int32)
    ids = (1, 2, 4, 5)

    ref = M.eval_score_matrix_device(scores, train, test, tlen, ids, k,
                                     use_pallas=False)

    monkeypatch.setattr(M, "_use_small_ranks", lambda n_, t_: True)
    import skrx.ops.pallas.topk_blocks as tb
    real = tb.masked_topk_ranks_small

    def interp(scores, k, test_table, mask_table=None, **kw):
        kw.pop("interpret", None)
        return real.__wrapped__(scores, k, test_table,
                                mask_table=mask_table, interpret=True)

    import skrx.ops.pallas as P
    monkeypatch.setattr(tb, "masked_topk_ranks_small", interp)
    monkeypatch.setattr(P, "masked_topk_ranks_small", interp)
    got = M.eval_score_matrix_device(scores, train, test, tlen, ids, k,
                                     use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
