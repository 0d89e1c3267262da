"""Zoo smoke tests: every model trains a few epochs on synthetic data,
produces finite metrics, honors the predict contract, and (where it learns)
does better than chance.

Grows as models land; parity with the reference registry contract
(<Name> + <Name>Config exported from skrx.models.<Name>).
"""
import importlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig
from skrx.utils import ModelRegistry

# (name, params) — params sized for fast CI on the tiny synthetic dataset.
ZOO = [
    ("Pop", {}),
    ("BPRMF", dict(lr=0.01, reg=0.01, n_dim=16, batch_size=256, epochs=3,
                   early_stop=3)),
    ("FPMC", dict(lr=0.01, reg=0.01, embed_size=16, batch_size=256, epochs=3,
                  early_stop=3)),
    ("TransRec", dict(lr=0.01, reg=0.01, embed_size=16, batch_size=256,
                      epochs=3, early_stop=3)),
    ("MultVAE", dict(lr=0.01, p_dims=[16], batch_size=64, epochs=3,
                     early_stop=3)),
    ("CDAE", dict(lr=0.01, reg=0.001, hidden_dim=16, batch_size=64, epochs=3,
                  early_stop=3)),
    ("LightGCN", dict(lr=0.01, reg=0.001, embed_size=16, n_layers=2,
                      batch_size=256, epochs=3, early_stop=3)),
    ("SelfCF", dict(lr=0.01, embed_dim=16, n_layers=2, batch_size=256,
                    epochs=3, early_stop=3)),
    ("LightGCL", dict(lr=0.01, d=16, gnn_layer=2, svd_q=4, batch_size=256,
                      epochs=3, early_stop=3)),
    ("LayerGCN", dict(lr=0.01, reg=0.001, embed_dim=16, n_layers=2,
                      dropout=0.2, batch_size=256, epochs=4, early_stop=4)),
    ("DENS", dict(lr=0.01, dim=16, context_hops=2, K=2, n_negs=3, ns="dens",
                  batch_size=256, epochs=3, early_stop=3)),
    ("DENS_dns", dict(lr=0.01, dim=16, context_hops=2, K=1, n_negs=3,
                      ns="dns", batch_size=256, epochs=2, early_stop=2)),
    ("Caser", dict(lr=0.01, embed_size=16, seq_L=4, seq_T=2, nv=2, nh=4,
                   batch_size=256, epochs=3, early_stop=3)),
    ("HGN", dict(lr=0.01, reg=0.001, seq_L=4, seq_T=2, embed_size=16,
                 batch_size=256, epochs=3, early_stop=3)),
    ("SASRec", dict(lr=0.01, hidden_units=16, max_len=10, num_blocks=1,
                    num_heads=2, dropout_rate=0.2, batch_size=32, epochs=3,
                    early_stop=3)),
    ("GRU4Rec", dict(lr=0.01, layers=[16], batch_size=16, loss="top1",
                     epochs=2, early_stop=2)),
    ("GRU4RecPlus", dict(lr=0.01, layers=[16], batch_size=16, loss="bpr_max",
                         n_sample=32, epochs=2, early_stop=2)),
    ("CML", dict(lr=0.05, reg=1.0, embed_size=16, dns=5, batch_size=128,
                 epochs=3, early_stop=3)),
    ("AOBPR", dict(lr=0.05, reg=0.01, embed_size=16, alpha=100,
                   batch_size=256, epochs=3, early_stop=3)),
    ("SRGNN", dict(lr=0.01, hidden_size=16, max_seq_len=20, batch_size=64,
                   epochs=2, early_stop=2)),
    ("SGAT", dict(lr=0.01, reg=0.001, n_layers=2, n_seqs=4, n_next=2,
                  embed_size=16, batch_size=256, epochs=2, early_stop=2)),
    ("BERT4Rec", dict(lr=0.001, max_seq_len=8, h_size=16, att_heads=2,
                      n_layers=1, batch_size=64, epochs=3, early_stop=3)),
]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("zoo")
    return synthetic.make_dataset_dir(str(root), num_users=60, num_items=100,
                                      num_ratings=1800, seed=5,
                                      latent_dim=4, latent_strength=6.0)


def _cfg(data_dir, name):
    return RunConfig(recommender=name, data_dir=data_dir, file_column="UIRT",
                     sep="\t", metric=("Recall", "NDCG"), top_k=(10,),
                     test_batch_size=32, seed=2021)


@pytest.mark.parametrize("name,params", ZOO, ids=[z[0] for z in ZOO])
def test_model_smoke(name, params, data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    name = name.split("_")[0]  # variant ids like DENS_dns -> model DENS
    registry = ModelRegistry()
    assert registry.load_skrx_model(name), f"registry failed to load {name}"
    model_cls, config_cls = registry.get_model(name)
    model = model_cls(_cfg(data_dir, name), params)
    result = model.fit()
    assert np.isfinite(result["NDCG@10"])
    assert result["NDCG@10"] >= 0.0

    scores = np.asarray(model.predict([0, 1, 2]))
    # sequence models score num_items+1 columns (pad item), like the reference
    assert scores.shape in ((3, model.dataset.num_items),
                            (3, model.dataset.num_items + 1))
    assert np.isfinite(scores).all()


def test_multvae_bf16_compute_close(data_dir, tmp_path, monkeypatch):
    """compute_dtype='bfloat16' (MXU mixed precision) trains to metrics close
    to f32 (f32 master weights and loss; bf16 only in the MLP matmuls)."""
    monkeypatch.chdir(tmp_path)
    registry = ModelRegistry()
    registry.load_skrx_model("MultVAE")
    model_cls, _ = registry.get_model("MultVAE")
    params = dict(lr=0.01, p_dims=[16], batch_size=64, epochs=2, early_stop=2)
    r32 = model_cls(_cfg(data_dir, "MultVAE"),
                    dict(params, compute_dtype="float32")).fit()
    rbf = model_cls(_cfg(data_dir, "MultVAE"),
                    dict(params, compute_dtype="bfloat16")).fit()
    assert np.isfinite(rbf["NDCG@10"])
    np.testing.assert_allclose(rbf["NDCG@10"], r32["NDCG@10"], rtol=0.15)
