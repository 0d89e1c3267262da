import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from skrx.ops import eval_score_matrix_device, mask_items
from .oracle import eval_score_matrix_oracle

ALL_METRICS = (1, 2, 3, 4, 5)


def _pad_lists(lists, pad_id):
    max_len = max(len(x) for x in lists)
    out = np.full((len(lists), max(max_len, 1)), pad_id, dtype=np.int32)
    for i, x in enumerate(lists):
        out[i, : len(x)] = x
    return out


def _random_case(rng, b, n, max_test, max_train):
    scores = rng.standard_normal((b, n)).astype(np.float32)
    test_items, train_items = [], []
    for _ in range(b):
        n_test = rng.integers(1, max_test + 1)
        n_train = rng.integers(0, max_train + 1)
        perm = rng.permutation(n)
        test_items.append(perm[:n_test])
        train_items.append(perm[n_test: n_test + n_train])
    return scores, test_items, train_items


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("top_k", [5, 20])
def test_device_metrics_match_cpp_oracle(seed, top_k):
    rng = np.random.default_rng(seed)
    b, n = 16, 200
    scores, test_items, train_items = _random_case(rng, b, n, max_test=12,
                                                   max_train=30)
    oracle = eval_score_matrix_oracle(scores, test_items, train_items,
                                      ALL_METRICS, top_k)
    test_table = _pad_lists(test_items, pad_id=n)
    train_table = _pad_lists(train_items, pad_id=n)
    test_len = np.array([len(t) for t in test_items], dtype=np.int32)
    got = eval_score_matrix_device(jnp.asarray(scores), jnp.asarray(train_table),
                                   jnp.asarray(test_table), jnp.asarray(test_len),
                                   ALL_METRICS, top_k)
    np.testing.assert_allclose(np.asarray(got), oracle, rtol=5e-4, atol=5e-5)


def test_metrics_with_ties_and_zeros():
    """The reference's 2*top_k partial-sort guard exists because of
    zero-score ties (evaluate.h:33-45); verify exact index-order
    tie-breaking here."""
    n = 50
    scores = np.zeros((1, n), dtype=np.float32)
    scores[0, 10] = 1.0
    test_items = [[10, 3]]
    oracle = eval_score_matrix_oracle(scores, test_items, [[]], ALL_METRICS, 10)
    got = eval_score_matrix_device(
        jnp.asarray(scores), jnp.full((1, 1), n, np.int32),
        jnp.asarray(_pad_lists(test_items, n)),
        jnp.array([2], np.int32), ALL_METRICS, 10)
    np.testing.assert_allclose(np.asarray(got), oracle, rtol=5e-4, atol=5e-5)
    # item 10 ranked first (score 1), item 3 ranked at position 4 (index order
    # among zero ties: 0,1,2,3 -> positions 1..4)
    hits_prec = np.asarray(got)[0, 0]  # precision row
    assert hits_prec[0] == 1.0


def test_evaluator_top_show_selection():
    """top_k tuple selects the right cumulative columns
    (evaluator.py:207-213 semantics)."""
    from skrx.eval import RankingEvaluator

    rng = np.random.default_rng(5)
    n = 100
    scores = rng.standard_normal((6, n)).astype(np.float32)
    test = {u: rng.permutation(n)[:4] for u in range(6)}

    class M:
        def predict(self, users):
            return jnp.asarray(scores[np.asarray(users)])

    full = RankingEvaluator({}, test, metric=("NDCG", "Recall"), top_k=50,
                            batch_size=6).evaluate(M())
    sel = RankingEvaluator({}, test, metric=("NDCG", "Recall"),
                           top_k=(5, 20, 50), batch_size=6).evaluate(M())
    for k in (5, 20, 50):
        np.testing.assert_allclose(sel[f"NDCG@{k}"], full[f"NDCG@{k}"],
                                   rtol=1e-6)
        np.testing.assert_allclose(sel[f"Recall@{k}"], full[f"Recall@{k}"],
                                   rtol=1e-6)


def test_mask_items_drops_padding():
    scores = jnp.ones((2, 5))
    table = jnp.array([[0, 5, 5], [2, 3, 5]], dtype=jnp.int32)  # pad id 5
    masked = np.asarray(mask_items(scores, table))
    assert masked[0, 0] == -np.inf
    assert (masked[0, 1:] == 1.0).all()
    assert masked[1, 2] == -np.inf and masked[1, 3] == -np.inf
    assert masked.shape == (2, 5)


def test_leave_one_out_recall_is_hitratio():
    rng = np.random.default_rng(3)
    b, n = 8, 100
    scores = rng.standard_normal((b, n)).astype(np.float32)
    test_items = [[int(rng.integers(n))] for _ in range(b)]
    got = eval_score_matrix_device(
        jnp.asarray(scores), jnp.full((b, 1), n, np.int32),
        jnp.asarray(_pad_lists(test_items, n)),
        jnp.ones(b, np.int32), (2, 3, 5), 20)
    got = np.asarray(got)
    # leave-one-out: recall == hit ratio in {0,1}; MAP == MRR (SURVEY/evaluator doc)
    assert set(np.unique(got[:, 0])).issubset({0.0, 1.0})
    np.testing.assert_allclose(got[:, 1], got[:, 2], rtol=1e-6)


def test_chunked_evaluation_matches_full():
    """evaluate_chunked (running top-k merge over item chunks) must produce
    the same metrics as the full (B, N) evaluation."""
    from skrx.eval import RankingEvaluator

    rng = np.random.default_rng(7)
    u, n = 30, 500
    scores = rng.standard_normal((u, n)).astype(np.float32)
    train = {x: rng.permutation(n)[:20] for x in range(u)}
    test = {x: rng.permutation(n)[:5] for x in range(u)}

    class M:
        def predict(self, users):
            return jnp.asarray(scores[np.asarray(users)])

        def predict_chunk(self, users, lo, hi):
            return jnp.asarray(scores[np.asarray(users), lo:hi])

    ev = RankingEvaluator(train, test, metric=("Precision", "Recall", "NDCG",
                                               "MRR", "MAP"),
                          top_k=(5, 10, 20), batch_size=8)
    full = ev.evaluate(M())
    chunked = ev.evaluate_chunked(M(), num_items=n, chunk_size=128)
    for m in full.metrics():
        np.testing.assert_allclose(chunked[m], full[m], rtol=1e-5,
                                   atol=1e-7)


@pytest.mark.parametrize("name,params", [
    ("TransRec", dict(lr=0.01, embed_size=8, batch_size=128)),
    ("CML", dict(lr=0.05, reg=1.0, embed_size=8, dns=3, batch_size=128)),
    ("HGN", dict(lr=0.01, seq_L=4, seq_T=2, embed_size=8, batch_size=128)),
    ("SASRec", dict(lr=0.01, hidden_units=8, max_len=8, num_blocks=1,
                    num_heads=1, batch_size=32)),
    ("Caser", dict(lr=0.01, embed_size=8, seq_L=4, seq_T=2, nv=2, nh=4,
                   batch_size=128)),
    ("BERT4Rec", dict(lr=0.01, h_size=8, max_seq_len=8, n_layers=1,
                      att_heads=1, batch_size=32)),
    ("SGAT", dict(lr=0.01, embed_size=8, n_layers=2, n_seqs=3, n_next=1,
                  batch_size=128)),
    # round 4: the autoencoder family joins the tower contract (their
    # decoder final layer is a plain dot)
    ("CDAE", dict(lr=0.01, reg=0.001, hidden_dim=8, dropout=0.2, num_neg=2,
                  batch_size=32)),
    ("MultVAE", dict(lr=0.01, p_dims=[8, 16], batch_size=32)),
    # round 4: session RNNs join too; leaky_relu exercises the per-chunk
    # elementwise final activation (exact for any act)
    ("GRU4Rec", dict(lr=0.05, layers=[8], batch_size=32,
                     final_act="leaky_relu")),
    ("SRGNN", dict(lr=0.01, hidden_size=8, step=1, max_seq_len=10,
                   batch_size=32)),
])
def test_chunked_eval_all_families(name, params, tmp_path, monkeypatch):
    """evaluate_chunked == evaluate across model families."""
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.utils import ModelRegistry

    data = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                      num_items=60, num_ratings=800, seed=3)
    reg = ModelRegistry()
    assert reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)
    run = RunConfig(recommender=name, data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG", "Recall"), top_k=(10,),
                    test_batch_size=16, seed=1)
    m = cls(run, dict(params, epochs=1, early_stop=1))
    m.fit()
    r_full = m.evaluator.evaluate(m)
    n = np.asarray(m.predict([0])).shape[1]
    r_chunk = m.evaluator.evaluate_chunked(m, num_items=n, chunk_size=17)
    for k in r_full.metrics():
        np.testing.assert_allclose(r_chunk[k], r_full[k], rtol=1e-4,
                                   atol=1e-6)


def test_user_vec_chunk_cache_encodes_once(tmp_path, monkeypatch):
    """CachedUserVecChunkMixin: the (expensive) user encoder runs once per
    (params, user batch), not once per item chunk; cache invalidates on new
    users and on new params."""
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.SASRec import SASRec

    data = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=50, num_ratings=600, seed=5)
    run = RunConfig(recommender="SASRec", data_dir=data, file_column="UIRT",
                    sep="\t", top_k=(10,), test_batch_size=8, seed=1)
    m = SASRec(run, dict(lr=0.01, hidden_units=8, max_len=8, num_blocks=1,
                         num_heads=1, batch_size=32, epochs=1, early_stop=1))
    calls = []
    orig = m._user_vectors
    m._user_vectors = lambda u: (calls.append(1), orig(u))[1]

    users = [0, 1, 2, 3]
    full = np.asarray(m.predict(users))
    chunks = [np.asarray(m.predict_chunk(users, lo, min(lo + 13, 50)))
              for lo in range(0, 50, 13)]
    assert len(calls) == 1  # one encode for all 4 chunks
    np.testing.assert_allclose(np.concatenate(chunks, axis=1), full,
                               rtol=1e-5, atol=1e-6)

    m.predict_chunk([4, 5, 6, 7], 0, 13)
    assert len(calls) == 2  # new user batch -> re-encode

    m.params = dict(m.params)  # params object replaced (as after an epoch)
    m.predict_chunk([4, 5, 6, 7], 0, 13)
    assert len(calls) == 3  # new params -> re-encode


def test_chunked_eval_sparse_user_never_falsely_hits_item_zero():
    """Users with fewer rankable items than max_top must not count item 0 as
    a hit through the -inf filler slots (the running-merge init sentinel)."""
    import jax.numpy as jnp
    from skrx.eval import RankingEvaluator

    # catalog of 6 items; user 0 trained on 1..4, tests on item 0 only; with
    # top_k=5 only 2 rankable items (0 and 5) exist -> 3 filler slots
    train = {0: np.array([1, 2, 3, 4])}
    test = {0: np.array([0])}
    ev = RankingEvaluator(train, test, metric=("Recall",), top_k=(5,),
                          batch_size=4)

    class _M:
        def predict(self, users):
            # item 5 scores above item 0
            return np.tile(np.array([[1.0, 9, 9, 9, 9, 2.0]], np.float32),
                           (len(users), 1))

        def predict_chunk(self, users, lo, hi):
            return self.predict(users)[:, lo:hi]

    full = ev.evaluate(_M())
    chunked = ev.evaluate_chunked(_M(), num_items=6, chunk_size=2)
    # item 0 ranks 2nd of the 2 rankable items -> recall@5 = 1.0 in BOTH
    np.testing.assert_allclose(float(chunked["Recall@5"]),
                               float(full["Recall@5"]), atol=1e-6)

    class _Miss(_M):
        def predict(self, users):
            # test item 0 scores BELOW every unrated item: it ranks 2nd of 2
            # rankable -> still within top 5 -> recall 1; but with top_k=1 it
            # must be a miss in both paths (filler slots must not hit)
            return np.tile(np.array([[1.0, 9, 9, 9, 9, 2.0]], np.float32),
                           (len(users), 1))

    ev1 = RankingEvaluator(train, test, metric=("Recall",), top_k=(1,),
                           batch_size=4)
    full1 = ev1.evaluate(_Miss())
    chunked1 = ev1.evaluate_chunked(_Miss(), num_items=6, chunk_size=2)
    assert float(full1["Recall@1"]) == 0.0
    assert float(chunked1["Recall@1"]) == 0.0


def test_topk_clamps_to_small_catalogs():
    """max_top larger than the catalog: tail ranks are misses, no crash."""
    from skrx.ops.metrics import eval_score_matrix_device

    scores = jnp.asarray(np.array([[3.0, 1.0, 2.0]], np.float32))
    train = jnp.asarray(np.array([[3]], np.int32))   # pad id = N (none)
    test = jnp.asarray(np.array([[0, 3]], np.int32))
    tlen = jnp.asarray(np.array([1], np.int32))
    out = np.asarray(eval_score_matrix_device(scores, train, test, tlen,
                                              (2,), 10))  # Recall, k=10
    # item 0 is rank 1 of 3; recall@k = 1 for all k >= 1, incl. padded ranks
    np.testing.assert_allclose(out[0, 0], np.ones(10))


def test_eval_score_matrix_device_paged_matches_per_batch():
    """The paged (one-dispatch, scanned) entry returns exactly the per-batch
    results for every page."""
    import jax.numpy as jnp
    from skrx.ops.metrics import (eval_score_matrix_device,
                                  eval_score_matrix_device_paged)

    rng = np.random.default_rng(21)
    g, b, n, k = 3, 8, 200, 10
    scores = rng.standard_normal((g, b, n)).astype(np.float32)
    train = rng.integers(0, n + 1, (g, b, 12)).astype(np.int32)
    test = rng.integers(0, n, (g, b, 4)).astype(np.int32)
    tlen = rng.integers(1, 5, (g, b)).astype(np.int32)
    mids = (1, 2, 4, 5)
    paged = np.asarray(eval_score_matrix_device_paged(
        jnp.asarray(scores), jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(tlen), mids, k, use_pallas=False))
    for i in range(g):
        one = np.asarray(eval_score_matrix_device(
            jnp.asarray(scores[i]), jnp.asarray(train[i]),
            jnp.asarray(test[i]), jnp.asarray(tlen[i]), mids, k,
            use_pallas=False))
        np.testing.assert_array_equal(paged[i], one)
