"""bfloat16-message propagation quality validation (VERDICT r3 #2).

The MXU propagate kernel can carry its gathered edge messages in bfloat16
(skrx/ops/pallas/segsum_mxu.py: ~1e-3 relative feature rounding, measured
135 -> 111 ms/step at Gowalla scale). Before `auto` may resolve to it on
TPU, the rounding must be shown quality-neutral: here each graph model
trains twice on the same data/seed — f32 `segment` propagation vs
`mxu_bf16` (interpret-mode kernel on CPU; the SAME rounding behavior the
TPU kernel applies, since the cast happens in the jitted gather, not inside
Mosaic) — and the best-epoch NDCG@10 / Recall@10 must agree within a tight
band. The f32 run is itself anchored to the reference torch-CPU loop by
tests/test_quality_parity*.py, closing the chain
reference <-> f32 <-> bf16.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig
from skrx.io import RSDataset

# bf16 messages round each propagated feature to ~3 decimal digits; over 15
# epochs of training on the tiny synthetic set the final best-epoch metrics
# stay within a few percent of the f32 run (measured ratios in the test
# log; the band is deliberately tighter than the reference-parity bands
# because both runs share loop, seed, and data).
BAND = (0.9, 1.1)


@pytest.fixture(autouse=True)
def _seed_numpy():
    from skrx.utils.random import set_host_seed
    np.random.seed(20260819)
    set_host_seed(20260819)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("bf16")
    path = synthetic.make_dataset_dir(str(root), num_users=120,
                                      num_items=200, num_ratings=3500,
                                      seed=13, latent_dim=4,
                                      latent_strength=8.0)
    return path, RSDataset(path, "\t", "UIRT")


def _fit(name, path, hp, graph_impl):
    from skrx.utils import ModelRegistry
    reg = ModelRegistry()
    assert reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)
    run = RunConfig(recommender=name, data_dir=path, file_column="UIRT",
                    sep="\t", metric=("NDCG", "Recall"), top_k=(10,),
                    test_batch_size=64, seed=2021)
    return cls(run, dict(hp, graph_impl=graph_impl)).fit()


MODELS = [
    ("LightGCN", dict(lr=0.01, reg=0.001, embed_size=16, n_layers=2,
                      batch_size=256, epochs=15, early_stop=15)),
    ("LayerGCN", dict(lr=0.01, reg=1e-3, embed_dim=16, n_layers=2,
                      dropout=0.2, batch_size=256, epochs=15,
                      early_stop=15)),
    ("DENS", dict(lr=0.01, l2=1e-4, gamma=0.3, dim=16, context_hops=2,
                  K=1, n_negs=4, ns="dens", pool="mean", warmup=10,
                  mess_dropout=False, edge_dropout=False, batch_size=256,
                  epochs=15, early_stop=15)),
    # remaining propagate users (advisor r4: 'auto'->bf16 applied to them
    # with the quality check recorded only for the three above)
    ("SelfCF", dict(lr=0.01, embed_dim=16, n_layers=2, batch_size=256,
                    epochs=10, early_stop=10)),
    ("LightGCL", dict(lr=0.01, d=16, gnn_layer=2, svd_q=4, batch_size=256,
                      epochs=10, early_stop=10)),
    ("SGAT", dict(lr=0.01, reg=0.001, n_layers=2, n_seqs=4, n_next=2,
                  embed_size=16, batch_size=256, epochs=8, early_stop=8)),
]

MM_MODELS = [
    ("BM3", dict(lr=0.01, embed_dim=16, n_layers=1, batch_size=256,
                 epochs=10, early_stop=10)),
    ("SLMRec", dict(lr=0.01, rec_dim=16, layer_num=2, ssl_task="FAC",
                    batch_size=256, epochs=10, early_stop=10)),
    ("LATTICE", dict(lr=0.01, embed_dim=16, feat_embed_dim=16,
                     weight_size=[16, 16], knn_k=5, batch_size=256,
                     epochs=10, early_stop=10)),
    ("FREEDOM", dict(lr=0.01, embed_dim=16, feat_dim=16, knn_k=5,
                     n_ui_layers=2, dropout=0.5, batch_size=256, epochs=10,
                     early_stop=10)),
    ("MGCN", dict(lr=0.01, embed_dim=16, knn_k=5, batch_size=256,
                  epochs=10, early_stop=10)),
]


def test_mxu_bf16_really_rounds(dataset):
    """Guard against a silently-f32 'bf16' run: the mxu_bf16 graph must
    carry bf16 messages and its propagate output must differ from f32 at
    the ~1e-3 level (but not more)."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from skrx.models.common import build_prop_graph
    from skrx.ops.graph import propagate

    _, ds = dataset
    rows = ds.train_data.to_user_item_pairs()
    n = ds.num_users + ds.num_items
    adj = sp.coo_matrix((np.ones(len(rows), np.float32),
                         (rows[:, 0], ds.num_users + rows[:, 1])),
                        shape=(n, n)).tocsr()
    g16 = build_prop_graph(adj, "mxu_bf16")
    g32 = build_prop_graph(adj, "mxu")
    assert g16.msg_dtype == jnp.bfloat16 and g32.msg_dtype == jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    y16, y32 = np.asarray(propagate(g16, x)), np.asarray(propagate(g32, x))
    rel = np.abs(y16 - y32).max() / np.abs(y32).max()
    assert 1e-5 < rel < 2e-2, rel   # rounded, but only at bf16 level


def _assert_neutral(name, path, hp):
    f32 = _fit(name, path, hp, "segment")
    bf16 = _fit(name, path, hp, "mxu_bf16")
    for metric in ("NDCG@10", "Recall@10"):
        ratio = bf16[metric] / f32[metric]
        print(f"{name} {metric}: bf16/f32 = {ratio:.4f} "
              f"({bf16[metric]:.5f} vs {f32[metric]:.5f})")
        assert BAND[0] <= ratio <= BAND[1], \
            (name, metric, ratio, bf16[metric], f32[metric])


@pytest.mark.parametrize("name,hp", MODELS, ids=[m[0] for m in MODELS])
def test_bf16_messages_quality_neutral(name, hp, dataset, tmp_path,
                                       monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, _ = dataset
    _assert_neutral(name, path, hp)


@pytest.fixture(scope="module")
def mm_dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("bf16mm")
    path = synthetic.make_dataset_dir(str(root), num_users=100,
                                      num_items=160, num_ratings=3000,
                                      seed=17, latent_dim=4,
                                      latent_strength=8.0, with_mm=True,
                                      img_dim=12, txt_dim=10)
    return path


@pytest.mark.parametrize("name,hp", MM_MODELS, ids=[m[0] for m in MM_MODELS])
def test_bf16_messages_quality_neutral_mm(name, hp, mm_dataset, tmp_path,
                                          monkeypatch):
    monkeypatch.chdir(tmp_path)
    _assert_neutral(name, mm_dataset, hp)
