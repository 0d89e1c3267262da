"""End-to-end slice test: BPRMF trains on synthetic data and beats Pop."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig


def _run_cfg(data_dir, **over):
    base = dict(recommender="BPRMF", data_dir=data_dir, file_column="UIRT",
                sep="\t", metric=("Recall", "NDCG"), top_k=(10, 20),
                test_batch_size=32, seed=2021)
    base.update(over)
    return RunConfig(**base)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("e2e")
    # Sparse + strongly low-rank so a factor model clearly beats popularity.
    return synthetic.make_dataset_dir(str(root), num_users=150, num_items=400,
                                      num_ratings=4000, seed=11,
                                      latent_dim=4, latent_strength=10.0)


def test_pop_runs(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.Pop import Pop
    model = Pop(_run_cfg(data_dir), {})
    result = model.fit()
    assert "NDCG@10" in result.results
    assert result["NDCG@10"] > 0.0


def test_bprmf_learns(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.BPRMF import BPRMF
    from skrx.models.Pop import Pop
    pop = Pop(_run_cfg(data_dir), {})
    pop_result = pop.fit()

    model = BPRMF(_run_cfg(data_dir),
                  dict(lr=0.01, reg=0.01, n_dim=32, batch_size=256,
                       epochs=30, early_stop=30))
    result = model.fit()
    # A trained MF must clearly beat the popularity baseline on NDCG@10.
    assert result["NDCG@10"] > pop_result["NDCG@10"]
    assert result["Recall@20"] > 0.05

    # predict contract: (B, N) scores
    scores = np.asarray(model.predict([0, 1, 2]))
    assert scores.shape == (3, model.num_items)
    assert np.isfinite(scores).all()


def test_lightgcn_learns(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.LightGCN import LightGCN
    from skrx.models.Pop import Pop
    pop_result = Pop(_run_cfg(data_dir), {}).fit()
    model = LightGCN(_run_cfg(data_dir),
                     dict(lr=0.01, reg=0.001, embed_size=32, n_layers=2,
                          batch_size=256, epochs=30, early_stop=30))
    result = model.fit()
    assert result["NDCG@10"] > pop_result["NDCG@10"]


def test_sasrec_learns(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.SASRec import SASRec
    from skrx.models.Pop import Pop
    pop_result = Pop(_run_cfg(data_dir), {}).fit()
    model = SASRec(_run_cfg(data_dir),
                   dict(lr=0.005, hidden_units=32, max_len=20, num_blocks=1,
                        num_heads=1, dropout_rate=0.2, batch_size=64,
                        epochs=40, early_stop=40))
    result = model.fit()
    # sequential model trained properly must clearly beat popularity
    assert result["NDCG@10"] > pop_result["NDCG@10"]


def test_evaluator_group_eval(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.Pop import Pop
    model = Pop(_run_cfg(data_dir), {})
    model.fit()
    groups = model.evaluate_group()
    assert 1 <= len(groups) <= 4
    for label, report in groups:
        assert "NDCG@10" in report.results


def test_bprmf_predict_chunk_matches_full(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp
    from skrx.models.BPRMF import BPRMF
    m = BPRMF(_run_cfg(data_dir), dict(lr=0.05, n_dim=8, batch_size=128,
                                       epochs=1, early_stop=1))
    m.fit()
    users = [0, 1, 2]
    full = np.asarray(m.predict(users))
    parts = [np.asarray(m.predict_chunk(users, lo, min(lo + 150, m.num_items)))
             for lo in range(0, m.num_items, 150)]
    # sliced matmul reassociates the contraction: tiny float32 differences
    np.testing.assert_allclose(np.concatenate(parts, axis=1), full, rtol=1e-4,
                               atol=1e-6)

    # chunked evaluator end-to-end equals full evaluator
    r_full = m.evaluator.evaluate(m)
    r_chunk = m.evaluator.evaluate_chunked(m, num_items=m.num_items,
                                           chunk_size=128)
    for k in r_full.metrics():
        np.testing.assert_allclose(r_chunk[k], r_full[k], rtol=1e-5, atol=1e-7)


def test_lightgcn_chunked_eval_matches(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.LightGCN import LightGCN
    m = LightGCN(_run_cfg(data_dir), dict(lr=0.01, embed_size=8, n_layers=2,
                                          batch_size=256, epochs=2,
                                          early_stop=2))
    m.fit()
    r_full = m.evaluator.evaluate(m)
    r_chunk = m.evaluator.evaluate_chunked(m, num_items=m.num_items,
                                           chunk_size=128)
    for k in r_full.metrics():
        np.testing.assert_allclose(r_chunk[k], r_full[k], rtol=1e-4,
                                   atol=1e-6)
