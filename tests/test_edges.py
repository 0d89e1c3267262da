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
