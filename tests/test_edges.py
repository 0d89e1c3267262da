"""Edge-case coverage: RunConfig validation, evaluator user filtering,
derived-artifact caches."""
import numpy as np
import pytest

from skrx import RunConfig


def test_run_config_validation():
    with pytest.raises(AssertionError):
        RunConfig(file_column="BAD")
    with pytest.raises(AssertionError):
        RunConfig(metric=("Bogus",))
    with pytest.raises(AssertionError):
        RunConfig(test_batch_size=0)
    cfg = RunConfig(metric="NDCG", top_k=10)
    assert cfg.metric == ("NDCG",) and cfg.top_k == (10,)


def test_evaluator_filters_unknown_users():
    jnp = pytest.importorskip("jax.numpy")
    from skrx.eval import RankingEvaluator

    rng = np.random.default_rng(0)
    scores = rng.standard_normal((20, 50)).astype(np.float32)

    class M:
        def predict(self, users):
            return jnp.asarray(scores[np.asarray(users)])

    test = {u: rng.permutation(50)[:3] for u in range(10)}  # users 0..9 only
    ev = RankingEvaluator({}, test, metric=("NDCG",), top_k=(5,), batch_size=4)
    # request users 0..19: those without test items must be filtered out
    r = ev.evaluate(M(), test_users=range(20))
    r_all = ev.evaluate(M())
    np.testing.assert_allclose(r["NDCG@5"], r_all["NDCG@5"], rtol=1e-6)


def test_lightgcn_adj_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    pytest.importorskip("jax")
    from skrx.io import synthetic
    from skrx.models.LightGCN import LightGCN
    import os
    data = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=40, num_ratings=500, seed=1)
    cfg = RunConfig(recommender="LightGCN", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=16, seed=1)
    params = dict(lr=0.01, embed_size=8, n_layers=1, batch_size=64, epochs=1,
                  early_stop=1)
    m1 = LightGCN(cfg, params)
    cache = os.path.join(data, "_LightGCN_data", "pre_adj.npz")
    assert os.path.exists(cache)
    # second construction loads the cached adjacency (same graph)
    m2 = LightGCN(cfg, params)
    np.testing.assert_allclose(np.asarray(m1.graph.weight),
                               np.asarray(m2.graph.weight))


def test_mm_edges_cache_roundtrip(tmp_path):
    from skrx.ops.mm_graph import cached_mm_edges
    rng = np.random.default_rng(0)
    img = rng.standard_normal((30, 6)).astype(np.float32)
    txt = rng.standard_normal((30, 4)).astype(np.float32)
    r1 = cached_mm_edges(str(tmp_path), "t", 5, img, txt, 0.3)
    r2 = cached_mm_edges(str(tmp_path), "t", 5, img, txt, 0.3)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)


def test_parse_value_ini_booleans():
    from skrx.utils.config import parse_value
    assert parse_value("false") is False
    assert parse_value("True") is True
    assert parse_value(" FALSE ") is False
    assert parse_value("0.5") == 0.5
    assert parse_value("abc") == "abc"


def test_preprocessor_resplit_clears_stale_valid(tmp_path):
    import numpy as np
    import pandas as pd
    from skrx.io import Preprocessor

    rng = np.random.default_rng(0)
    df = pd.DataFrame({"user": rng.integers(0, 20, 400),
                       "item": rng.integers(0, 30, 400),
                       "rating": 1.0,
                       "time": np.arange(400)})
    path = tmp_path / "raw.csv"
    df.to_csv(path, sep="\t", index=False, header=False)
    p = Preprocessor()
    p.load_data(str(path), sep="\t", columns="UIRT")
    p.drop_duplicates()
    p.split_data_by_ratio(0.7, 0.1, 0.2)
    assert p.valid_data is not None
    p.split_data_by_ratio(0.8, 0.0, 0.2)
    assert p.valid_data is None  # a re-split must not keep the stale set


def test_checkpointer_rejects_keep_zero(tmp_path):
    from skrx.utils.checkpoint import Checkpointer
    with pytest.raises(AssertionError):
        Checkpointer(str(tmp_path / "c"), keep=0)


def test_checkpointer_tolerates_corrupt_sidecar(tmp_path):
    import jax.numpy as jnp
    from skrx.utils.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "c"))
    state = {"w": jnp.ones((3,))}
    ck.save(1, state, extra={"epoch": 1})
    # simulate a pre-fix crash mid-write
    with open(str(tmp_path / "c" / "step_00000001.extra.pkl"), "wb") as f:
        f.write(b"\x80truncated")
    restored, extra, step = ck.restore(state)
    assert step == 1 and extra == {}
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(3))


def test_serve_rejects_out_of_range_users(tmp_path, monkeypatch):
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.Pop import Pop
    from skrx.serve import TopKRecommender

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                          num_items=50, num_ratings=600,
                                          seed=2)
    rc = RunConfig(recommender="Pop", data_dir=data_dir, file_column="UIRT",
                   sep="\t", metric=("NDCG",), top_k=(10,),
                   test_batch_size=16, seed=1)
    m = Pop(rc, {})
    m.fit()
    srv = TopKRecommender(m, k=5)
    srv.recommend([0, 1])  # valid
    with pytest.raises(ValueError, match="user ids"):
        srv.recommend([m.dataset.num_users + 3])
