"""Multimodal model family smoke tests (shared synthetic dataset with
.img.npz/.txt.npz features)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig
from skrx.utils import ModelRegistry

MM_ZOO = [
    ("BM3", dict(lr=0.01, embed_dim=16, n_layers=1, batch_size=256, epochs=3,
                 early_stop=3)),
    ("FREEDOM", dict(lr=0.01, embed_dim=16, feat_dim=16, knn_k=5,
                     n_ui_layers=2, dropout=0.5, batch_size=256, epochs=3,
                     early_stop=3)),
    ("LATTICE", dict(lr=0.01, embed_dim=16, feat_embed_dim=16,
                     weight_size=[16, 16], knn_k=5, batch_size=256, epochs=3,
                     early_stop=3)),
    ("LATTICE_ngcf", dict(lr=0.01, embed_dim=16, feat_embed_dim=16,
                          weight_size=[16, 16], knn_k=5, cf_model="ngcf",
                          batch_size=256, epochs=2, early_stop=2)),
    ("MGCN", dict(lr=0.01, embed_dim=16, knn_k=5, batch_size=256, epochs=3,
                  early_stop=3)),
    ("SLMRec", dict(lr=0.01, rec_dim=16, layer_num=2, ssl_task="FAC",
                    batch_size=256, epochs=3, early_stop=3)),
    ("SLMRec_FD", dict(lr=0.01, rec_dim=16, layer_num=2, ssl_task="FD",
                       batch_size=256, epochs=2, early_stop=2)),
    ("SLMRec_FM", dict(lr=0.01, rec_dim=16, layer_num=2, ssl_task="FM",
                       mm_fusion_mode="mean", batch_size=256, epochs=2,
                       early_stop=2)),
]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("mm")
    return synthetic.make_dataset_dir(str(root), num_users=50, num_items=80,
                                      num_ratings=1500, seed=9, with_mm=True,
                                      img_dim=12, txt_dim=10)


def _cfg(data_dir, name):
    return RunConfig(recommender=name, data_dir=data_dir, file_column="UIRT",
                     sep="\t", metric=("Recall", "NDCG"), top_k=(10,),
                     test_batch_size=32, seed=2021)


@pytest.mark.parametrize("name,params", MM_ZOO, ids=[z[0] for z in MM_ZOO])
def test_mm_model_smoke(name, params, data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    name = name.split("_")[0]
    registry = ModelRegistry()
    assert registry.load_skrx_model(name)
    model_cls, _ = registry.get_model(name)
    model = model_cls(_cfg(data_dir, name), params)
    result = model.fit()
    assert np.isfinite(result["NDCG@10"]) and result["NDCG@10"] >= 0.0
    scores = np.asarray(model.predict([0, 1, 2]))
    assert scores.shape == (3, model.dataset.num_items)
    assert np.isfinite(scores).all()


def test_mm_data_loading(data_dir):
    from skrx.io import RSDataset
    ds = RSDataset(data_dir, "\t", "UIRT")
    assert ds.img_features is not None and ds.img_dim == 12
    assert ds.txt_features is not None and ds.txt_dim == 10
    assert ds.img_features.shape[0] == ds.num_items


def test_lattice_chunked_and_fused_eval(data_dir, tmp_path, monkeypatch):
    """LATTICE joined the dot eval families (round 4): chunked and fused
    (interpret dot_topk on CPU) metrics equal full evaluation."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.LATTICE import LATTICE

    m = LATTICE(_cfg(data_dir, "LATTICE"),
                dict(lr=0.01, embed_dim=16, feat_embed_dim=16,
                     lambda_coeff=0.5, n_layers=1, knn_k=5,
                     cf_model="lightgcn", batch_size=256, epochs=1,
                     early_stop=1))
    m.fit()
    full = m.evaluator._evaluate_full(m)
    chunk = m.evaluator.evaluate_chunked(m, num_items=m.num_items,
                                         chunk_size=33)
    fused = m.evaluator.evaluate_fused(m, num_items=m.num_items)
    for k in full.metrics():
        np.testing.assert_allclose(chunk[k], full[k], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(fused[k], full[k], rtol=1e-5, atol=1e-7)


def test_slmrec_tp_eval_matches_full(data_dir, tmp_path, monkeypatch):
    """SLMRec evaluates tensor-parallel via its sigmoid _topk_score_fn
    (round 4): routed metrics equal full evaluation at (4, 2)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    monkeypatch.chdir(tmp_path)
    from skrx.models.SLMRec import SLMRec

    run = _cfg(data_dir, "SLMRec")
    run.mesh_shape = (4, 2)
    m = SLMRec(run, dict(lr=0.01, rec_dim=16, layer_num=1, ssl_alpha=0.01,
                         ssl_temp=0.1, temp=0.2, mm_fusion_mode="mean",
                         adj_type="pre", ssl_task="FAC", batch_size=256,
                         epochs=1, early_stop=1))
    m.fit()
    full = m.evaluator._evaluate_full(m)
    routed = m.evaluator.evaluate(m)   # model axis > 1 -> topk route
    for k in full.metrics():
        np.testing.assert_allclose(routed[k], full[k], rtol=1e-5, atol=1e-7)
