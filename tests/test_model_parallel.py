"""Tensor parallelism wired into real model paths (RunConfig.mesh_shape with
model axis > 1): row-sharded embedding tables in fit(), two-stage top-k
predict, and evaluator routing — all numerically identical to single-device.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx import RunConfig
from skrx.eval import RankingEvaluator
from skrx.parallel import make_mesh


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("mp")
    return synthetic.make_dataset_dir(str(root), num_users=60, num_items=90,
                                      num_ratings=1500, seed=11)


def _run_config(data_dir, **kw):
    return RunConfig(recommender="BPRMF", data_dir=data_dir,
                     file_column="UIRT", sep="\t", metric=("NDCG", "Recall"),
                     top_k=(10,), test_batch_size=16, seed=1, **kw)


def _fit(model_cls, data_dir, params, mesh_shape=None, monkey_chdir=None,
         **run_kw):
    run = _run_config(data_dir, mesh_shape=mesh_shape, **run_kw)
    m = model_cls(run, dict(params))
    return m, m.fit()


def test_bprmf_tp_matches_single_device(data_dir, tmp_path, monkeypatch):
    """BPRMF trained with mesh (4, 2) — tables row-sharded over 'model',
    batches over 'data' — must produce the same trajectory and metrics as
    single-device (same PRNG keys; math identical)."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.BPRMF import BPRMF

    hp = dict(lr=0.05, n_dim=16, batch_size=128, epochs=3, early_stop=5)
    m1, r1 = _fit(BPRMF, data_dir, hp)
    m2, r2 = _fit(BPRMF, data_dir, hp, mesh_shape=(4, 2))
    assert m2._tp, "mesh_shape=(4,2) must enable the tensor-parallel step"
    for k in r1.results:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-4, atol=1e-7)
    p1 = jax.tree_util.tree_map(np.asarray, m1.params)
    p2 = jax.tree_util.tree_map(np.asarray, m2.params)
    for k in p1:
        np.testing.assert_allclose(p2[k], p1[k], rtol=2e-4, atol=1e-6)

    # two-stage sharded top-k == full-matrix top-k (bias + no ties expected)
    users = np.arange(16)
    vals, idx = m2.predict_topk(users, 10)
    rv, ri = jax.lax.top_k(jnp.asarray(m2.predict(users)), 10)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


def test_bprmf_tp_predict_topk_masks_train_items(data_dir, tmp_path,
                                                 monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.BPRMF import BPRMF

    hp = dict(lr=0.05, n_dim=16, batch_size=128, epochs=1, early_stop=1)
    m, _ = _fit(BPRMF, data_dir, hp, mesh_shape=(4, 2))
    users = np.arange(8)
    n = m.num_items
    rng = np.random.default_rng(0)
    # mask table with some per-user items + pad id = n
    table = np.full((8, 6), n, np.int32)
    for i in range(8):
        table[i, :4] = rng.choice(n, 4, replace=False)
    vals, idx = m.predict_topk(users, 10, jnp.asarray(table))
    idx = np.asarray(idx)
    for i in range(8):
        assert not set(idx[i]) & set(table[i, :4].tolist()), \
            "masked train items surfaced in the sharded top-k"
    # reference: full scores with rows masked
    full = np.array(m.predict(users))  # writable copy
    for i in range(8):
        full[i, table[i, :4]] = -np.inf
    rv, ri = jax.lax.top_k(jnp.asarray(full), 10)
    np.testing.assert_array_equal(idx, np.asarray(ri))


def test_lightgcn_tp_matches_single_device(data_dir, tmp_path, monkeypatch):
    """LightGCN via _finalize_setup_flat's TP routing: sharded params through
    the graph propagation, identical metrics."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.LightGCN import LightGCN

    hp = dict(lr=0.05, embed_size=16, n_layers=2, batch_size=128, epochs=2,
              early_stop=5)
    _, r1 = _fit(LightGCN, data_dir, hp)
    m2, r2 = _fit(LightGCN, data_dir, hp, mesh_shape=(4, 2))
    assert not m2._use_flat, "TP must route away from the flat raveled step"
    for k in r1.results:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-4, atol=1e-7)


class _FactoredModel:
    """predict == u @ i.T (+bias); exposes predict_topk via the mixin."""

    def __init__(self, mesh, num_users=32, num_items=100, dim=8, seed=0):
        from skrx.models.common import ChunkedDotPredictMixin
        rng = np.random.default_rng(seed)
        self.mesh = mesh
        self.num_items = num_items
        self._u = jnp.asarray(rng.standard_normal((num_users, dim)),
                              jnp.float32)
        self._i = jnp.asarray(rng.standard_normal((num_items, dim)),
                              jnp.float32)
        self._b = jnp.asarray(rng.standard_normal(num_items), jnp.float32)
        self._mixin = ChunkedDotPredictMixin
        self.predict_topk = ChunkedDotPredictMixin.predict_topk.__get__(self)

    def _chunk_embeddings(self):
        return self._u, self._i

    def _chunk_bias(self):
        return self._b

    def predict(self, users):
        u = self._u[jnp.asarray(np.asarray(users, np.int32))]
        return u @ self._i.T + self._b[None, :]


def test_evaluate_topk_equals_full_eval():
    """evaluator.evaluate on a (d, m>1) mesh routes through evaluate_topk and
    must reproduce the full-matrix metrics exactly."""
    mesh = make_mesh((2, 4))
    model = _FactoredModel(mesh)
    rng = np.random.default_rng(3)
    train = {u: rng.permutation(100)[:10] for u in range(32)}
    test = {u: np.setdiff1d(rng.permutation(100)[:25],
                            train[u])[:5] for u in range(32)}
    kwargs = dict(metric=("Precision", "Recall", "NDCG", "MAP", "MRR"),
                  top_k=(5, 10), batch_size=16)
    full = RankingEvaluator(train, test, **kwargs)._evaluate_full(model)
    ev = RankingEvaluator(train, test, mesh=mesh, **kwargs)
    routed = ev.evaluate(model)
    topk = ev.evaluate_topk(model, model.num_items)
    for m in full.metrics():
        np.testing.assert_allclose(routed[m], full[m], rtol=1e-6)
        np.testing.assert_allclose(topk[m], full[m], rtol=1e-6)


def test_eval_mode_chunked_forced_in_fit(data_dir, tmp_path, monkeypatch):
    """RunConfig(eval_mode='chunked') routes fit()'s per-epoch eval through
    evaluate_chunked with identical metrics to full eval."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.BPRMF import BPRMF

    hp = dict(lr=0.05, n_dim=16, batch_size=128, epochs=2, early_stop=5)
    calls = []
    orig = RankingEvaluator.evaluate_chunked

    def spy(self, model, num_items, chunk_size=65536, test_users=None):
        calls.append(chunk_size)
        return orig(self, model, num_items, chunk_size, test_users)

    monkeypatch.setattr(RankingEvaluator, "evaluate_chunked", spy)
    m1, r1 = _fit(BPRMF, data_dir, hp)
    assert not calls, "full eval must not hit the chunked path by default"
    m2, r2 = _fit(BPRMF, data_dir, hp, eval_mode="chunked",
                  eval_chunk_size=32)
    assert calls and all(c == 32 for c in calls)
    for k in r1.results:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-6)


def test_eval_mode_auto_threshold():
    """auto mode flips to chunked when num_items >= threshold."""
    mesh = None
    model = _FactoredModel(mesh)
    model.predict_chunk = lambda users, lo, hi: model.predict(users)[:, lo:hi]
    rng = np.random.default_rng(5)
    train = {u: rng.permutation(100)[:10] for u in range(32)}
    test = {u: np.setdiff1d(rng.permutation(100)[:25],
                            train[u])[:5] for u in range(32)}
    kwargs = dict(metric=("NDCG",), top_k=(10,), batch_size=16)
    full = RankingEvaluator(train, test, **kwargs).evaluate(model)
    auto = RankingEvaluator(train, test, chunk_threshold=50, chunk_size=33,
                            **kwargs).evaluate(model)
    np.testing.assert_allclose(auto["NDCG@10"], full["NDCG@10"], rtol=1e-6)


def test_fpmc_tp_matches_single_device(data_dir, tmp_path, monkeypatch):
    """FPMC (sequential MF, four embedding tables) through the same
    _finalize_setup_flat TP routing: a (4, 2) mesh must reproduce the
    single-device trajectory — TP is a generic capability of the shared
    harness, not a per-model special case."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.FPMC import FPMC

    hp = dict(lr=0.05, reg=0.01, embed_size=16, batch_size=128, epochs=2,
              early_stop=5)
    _, r1 = _fit(FPMC, data_dir, hp)
    m2, r2 = _fit(FPMC, data_dir, hp, mesh_shape=(4, 2))
    assert not m2._use_flat, "TP must route away from the flat raveled step"
    for k in r1.results:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-4, atol=1e-7)


def test_sasrec_tp_matches_single_device(data_dir, tmp_path, monkeypatch):
    """SASRec on a (4, 2) mesh: training is data-parallel (tower params are
    tiny and stay replicated), but EVALUATION routes through the tower
    predict_topk — catalog scoring sharded over the item axis with a
    two-stage merge — and must reproduce single-device metrics (VERDICT r2
    directive #3)."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.SASRec import SASRec

    hp = dict(lr=0.01, hidden_units=16, max_len=10, num_blocks=1,
              num_heads=1, batch_size=32, epochs=2, early_stop=5)
    m1, r1 = _fit(SASRec, data_dir, hp)
    calls = []
    orig = RankingEvaluator.evaluate_topk

    def spy(self, model, num_items, test_users=None):
        calls.append(num_items)
        return orig(self, model, num_items, test_users)

    monkeypatch.setattr(RankingEvaluator, "evaluate_topk", spy)
    m2, r2 = _fit(SASRec, data_dir, hp, mesh_shape=(4, 2))
    assert calls, "a model-axis mesh must route tower eval through topk"
    for k in r1.results:
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-4, atol=1e-7)

    # two-stage sharded top-k == full-matrix top-k on the trained model
    users = np.arange(16)
    vals, idx = m2.predict_topk(users, 10)
    rv, ri = jax.lax.top_k(jnp.asarray(m2.predict(users)), 10)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


@pytest.mark.parametrize("name,params", [
    ("BERT4Rec", dict(lr=0.01, h_size=8, max_seq_len=8, n_layers=1,
                      att_heads=1, batch_size=32)),
    ("Caser", dict(lr=0.01, embed_size=8, seq_L=4, seq_T=2, nv=2, nh=4,
                   batch_size=128)),
    ("HGN", dict(lr=0.01, seq_L=4, seq_T=2, embed_size=8, batch_size=128)),
    ("SGAT", dict(lr=0.01, embed_size=8, n_layers=2, n_seqs=3, n_next=1,
                  batch_size=128)),
    # round 4: the autoencoder family joined the tower contract
    ("CDAE", dict(lr=0.01, reg=0.001, hidden_dim=8, dropout=0.2, num_neg=2,
                  batch_size=32)),
    ("MultVAE", dict(lr=0.01, p_dims=[8, 16], batch_size=32)),
    # round 4: session RNN — linear act takes the plain dot; relu routes a
    # custom _topk_score_fn through the shards (clamped ties must still
    # break like lax.top_k via the global-id rule)
    ("GRU4Rec", dict(lr=0.05, layers=[8], batch_size=32)),
    ("GRU4Rec", dict(lr=0.05, layers=[8], batch_size=32,
                     final_act="relu")),
    # round 4: plain/concatenated-dot models gain predict_topk too
    ("AOBPR", dict(lr=0.05, reg=0.001, embed_size=8)),
    ("FPMC", dict(lr=0.05, reg=0.01, embed_size=8, batch_size=128)),
    ("SelfCF", dict(lr=0.01, reg=0.0, embed_dim=8, n_layers=1, dropout=0.3,
                    batch_size=64)),
    # round 4: metric learning — euclidean _topk_score_fn inside the shards
    ("CML", dict(lr=0.05, reg=1.0, embed_size=8, dns=3, batch_size=128)),
    ("TransRec", dict(lr=0.01, embed_size=8, batch_size=128)),
    ("SRGNN", dict(lr=0.01, hidden_size=8, step=1, max_seq_len=10,
                   batch_size=32)),
])
def test_tower_tp_eval_matches_full(name, params, data_dir, tmp_path,
                                    monkeypatch):
    """Every sequence tower evaluates tensor-parallel on a model-axis mesh
    with metrics equal to the full (B, N) evaluation — including HGN/Caser's
    reference-parity pad column (_eval_width) and SGAT's non-dot euclidean
    score (custom _topk_score_fn)."""
    monkeypatch.chdir(tmp_path)
    from skrx.utils import ModelRegistry

    reg = ModelRegistry()
    assert reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)
    run = _run_config(data_dir, mesh_shape=(4, 2))
    run.recommender = name
    m = cls(run, dict(params, epochs=1, early_stop=1))
    m.fit()
    if name == "SGAT":  # derived predict state for the mixin paths
        m._final_items = m._propagate_items(m.params)
    full = m.evaluator._evaluate_full(m)
    routed = m.evaluator.evaluate(m)  # model axis > 1 -> topk route
    for k in full.metrics():
        np.testing.assert_allclose(routed[k], full[k], rtol=1e-5, atol=1e-7)


def test_dot_family_fused_eval_matches_full(data_dir, tmp_path,
                                            monkeypatch):
    """AOBPR (plain dot), FPMC and SelfCF (concatenated dots) joined the
    fused eval family in round 4: fused metrics equal full evaluation."""
    monkeypatch.chdir(tmp_path)
    from skrx.utils import ModelRegistry

    reg = ModelRegistry()
    for name, hp in [
        ("AOBPR", dict(lr=0.05, reg=0.001, embed_size=8)),
        ("FPMC", dict(lr=0.05, reg=0.01, embed_size=8, batch_size=128)),
        ("SelfCF", dict(lr=0.01, reg=0.0, embed_dim=8, n_layers=1,
                        dropout=0.3, batch_size=64)),
    ]:
        assert reg.load_skrx_model(name)
        cls, _ = reg.get_model(name)
        run = _run_config(data_dir)
        run.recommender = name
        m = cls(run, dict(hp, epochs=1, early_stop=1))
        m.fit()
        full = m.evaluator._evaluate_full(m)
        fused = m.evaluator.evaluate_fused(m, num_items=m.num_items)
        for k in full.metrics():
            np.testing.assert_allclose(fused[k], full[k], rtol=1e-5,
                                       atol=1e-7, err_msg=name)


def test_ae_fused_eval_matches_full(data_dir, tmp_path, monkeypatch):
    """Fused (dot_topk, paged) evaluation covers the autoencoder family
    (round 4): CDAE and MultVAE expose their decoder dot factors."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.CDAE import CDAE
    from skrx.models.MultVAE import MultVAE

    run = _run_config(data_dir)
    run.recommender = "CDAE"
    c = CDAE(run, dict(lr=0.01, reg=0.001, hidden_dim=8, dropout=0.2,
                       num_neg=2, batch_size=32, epochs=1, early_stop=1))
    c.fit()
    full_c = c.evaluator._evaluate_full(c)
    fused_c = c.evaluator.evaluate_fused(c, num_items=c.num_items)
    for k in full_c.metrics():
        np.testing.assert_allclose(fused_c[k], full_c[k], rtol=1e-5,
                                   atol=1e-7)

    run2 = _run_config(data_dir)
    run2.recommender = "MultVAE"
    v = MultVAE(run2, dict(lr=0.01, p_dims=[8, 16], batch_size=32, epochs=1,
                           early_stop=1))
    v.fit()
    full_v = v.evaluator._evaluate_full(v)
    fused_v = v.evaluator.evaluate_fused(v, num_items=v.num_items)
    for k in full_v.metrics():
        np.testing.assert_allclose(fused_v[k], full_v[k], rtol=1e-5,
                                   atol=1e-7)


def test_tower_fused_eval_matches_full(data_dir, tmp_path, monkeypatch):
    """Fused (dot_topk) evaluation now also covers dot towers via
    _topk_factors: SASRec (no bias) and HGN (bias + reference-parity pad
    column, catalog width N+1) both match full metrics."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.HGN import HGN
    from skrx.models.SASRec import SASRec

    run = _run_config(data_dir)
    m = SASRec(run, dict(lr=0.01, hidden_units=16, max_len=10, num_blocks=1,
                         num_heads=1, batch_size=32, epochs=1, early_stop=1))
    m.fit()
    full = m.evaluator._evaluate_full(m)
    fused = m.evaluator.evaluate_fused(m, num_items=m.num_items)
    for k in full.metrics():
        np.testing.assert_allclose(fused[k], full[k], rtol=1e-5, atol=1e-7)

    run2 = _run_config(data_dir)
    run2.recommender = "HGN"
    h = HGN(run2, dict(lr=0.01, seq_L=4, seq_T=2, embed_size=8,
                       batch_size=128, epochs=1, early_stop=1))
    h.fit()
    full_h = h.evaluator._evaluate_full(h)
    fused_h = h.evaluator.evaluate_fused(h, num_items=h._eval_width)
    for k in full_h.metrics():
        np.testing.assert_allclose(fused_h[k], full_h[k], rtol=1e-5,
                                   atol=1e-7)


def test_sharded_dot_topk_pallas_interpret_matches_xla():
    """Round 5: the per-shard Pallas selection (blockwise_topk local top-k +
    vmem_topk candidate merge) under shard_map must match the XLA path
    bit-for-bit on the finite slots — interpret mode on the CPU mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from skrx.parallel import sharded_dot_topk

    mesh = make_mesh((len(jax.devices()) // 2, 2))
    rng = np.random.default_rng(3)
    b, n, d, k = 16, 520, 8, 10
    uv = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    train = jnp.asarray(
        np.sort(rng.integers(0, n, (b, 7)), axis=1).astype(np.int32))
    v_x, i_x = sharded_dot_topk(mesh, uv, items, bias, k, n, train, {},
                                use_pallas=False)
    v_p, i_p = sharded_dot_topk(mesh, uv, items, bias, k, n, train, {},
                                use_pallas=True)
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))
    finite = np.isfinite(np.asarray(v_x))
    np.testing.assert_array_equal(np.asarray(i_p)[finite],
                                  np.asarray(i_x)[finite])
    # masked train items must never appear
    for r in range(b):
        assert not set(np.asarray(i_p)[r][finite[r]]) & set(
            np.asarray(train)[r].tolist())
