import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig
from skrx.serve import TopKRecommender


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF
    root = tmp_path_factory.mktemp("serve")
    data = synthetic.make_dataset_dir(str(root), num_users=50, num_items=80,
                                      num_ratings=1200, seed=3)
    import os
    os.chdir(root)
    run = RunConfig(recommender="BPRMF", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=32, seed=1)
    m = BPRMF(run, dict(lr=0.05, n_dim=8, batch_size=128, epochs=3,
                        early_stop=3))
    m.fit()
    return m


def test_topk_recommender_filters_seen(trained_model):
    server = TopKRecommender(trained_model, k=10)
    users = [0, 1, 2, 3]
    ids, scores = server.recommend(users)
    assert ids.shape == (4, 10) and scores.shape == (4, 10)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending
    train_dict = trained_model.dataset.train_data.to_user_dict()
    for u, row in zip(users, ids):
        assert not np.isin(row, train_dict[u]).any()
        assert len(np.unique(row)) == 10


def test_topk_recommender_unfiltered(trained_model):
    server = TopKRecommender(trained_model, k=5, filter_seen=False)
    ids, scores = server.recommend([0])
    full = np.asarray(trained_model.predict([0]))[0]
    np.testing.assert_array_equal(ids[0], np.argsort(-full, kind="stable")[:5])


def test_export_stablehlo(trained_model):
    server = TopKRecommender(trained_model, k=5)
    blob = server.export_stablehlo(batch_size=4)
    assert isinstance(blob, bytes) and len(blob) > 100
    # round-trip: deserialize and execute
    from jax import export as jexport
    restored = jexport.deserialize(blob)
    import jax.numpy as jnp
    scores = jnp.zeros((4, trained_model.num_items), jnp.float32)
    seen = jnp.full((4, server._seen.shape[1]),
                    trained_model.num_items, jnp.int32)
    idx, vals = restored.call(scores, seen)
    assert idx.shape == (4, 5)


def test_nan_guard(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF
    data = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=40, num_ratings=500, seed=2)
    run = RunConfig(recommender="BPRMF", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=16, seed=1)
    m = BPRMF(run, dict(lr=0.05, n_dim=8, batch_size=64, epochs=50,
                        early_stop=50))
    calls = {"n": 0}
    orig = m._train_epoch

    def poisoned(epoch):
        calls["n"] += 1
        if epoch >= 2:
            return float("nan")
        return orig(epoch)

    m._train_epoch = poisoned
    m.fit()
    assert calls["n"] == 3  # stopped right after the nan epoch


def test_fused_serving_matches_predict_path(trained_model):
    """fused='always' (dot_topk score+select, no (B, N) matrix) returns the
    same recommendations as the materialized predict+rank path."""
    model = trained_model
    base = TopKRecommender(model, k=7)
    fused = TopKRecommender(model, k=7, fused="always")
    assert fused._fused is not None, "dot model must take the fused path"
    users = [0, 3, 5, 11]
    ids_a, vals_a = base.recommend(users)
    ids_b, vals_b = fused.recommend(users)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(vals_a, vals_b, rtol=1e-6)
