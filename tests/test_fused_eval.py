"""Fused (single-kernel score+select) evaluation: parity, routing, guards.

Covers the round-2 advisor findings: evaluate_fused metric parity vs
evaluate() (interpret-mode dot_topk on CPU), the public RunConfig
eval_mode='fused' path through fit(), auto-routing's dim degrade, and the
model-parallel-mesh guard.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skrx.eval import RankingEvaluator


class _DotModel:
    """Minimal ChunkedDotPredict-contract model with a bias term."""

    def __init__(self, u_emb, i_emb, bias=None):
        self._u = jnp.asarray(u_emb, jnp.float32)
        self._i = jnp.asarray(i_emb, jnp.float32)
        self._b = None if bias is None else jnp.asarray(bias, jnp.float32)
        self.num_items = int(i_emb.shape[0])

    def _chunk_embeddings(self):
        return self._u, self._i

    def _chunk_bias(self):
        return self._b

    def predict(self, users):
        s = self._u[jnp.asarray(np.asarray(users, np.int32))] @ self._i.T
        if self._b is not None:
            s = s + self._b[None, :]
        return s

    def predict_chunk(self, users, lo, hi):
        return self.predict(users)[:, lo:hi]


def test_fused_eval_matches_full():
    """evaluate_fused == evaluate on a dot model with bias, train masks, and
    a non-multiple-of-batch user count."""
    rng = np.random.default_rng(11)
    u, n, d = 30, 500, 16
    m = _DotModel(rng.standard_normal((u, d)), rng.standard_normal((n, d)),
                  bias=rng.standard_normal(n))
    train = {x: rng.permutation(n)[:20] for x in range(u)}
    test = {x: rng.permutation(n)[:5] for x in range(u)}
    ev = RankingEvaluator(train, test, metric=("Precision", "Recall", "NDCG",
                                               "MRR", "MAP"),
                          top_k=(5, 10, 20), batch_size=8)
    full = ev.evaluate(m)
    fused = ev.evaluate_fused(m, num_items=n)
    for k in full.metrics():
        np.testing.assert_allclose(fused[k], full[k], rtol=1e-5, atol=1e-7)


def test_fused_eval_sparse_user_never_falsely_hits():
    """Users with fewer rankable items than max_top: -inf filler slots from
    the kernel must be misses, exactly as in the chunked path."""
    # catalog of 6; user trains on 1..4 so only items {0, 5} are rankable
    u_emb = np.ones((1, 2), np.float32)
    i_emb = np.array([[0.5, 0.5], [4, 5], [4, 5], [4, 5], [4, 5], [1, 1]],
                     np.float32)
    train = {0: np.array([1, 2, 3, 4])}
    test = {0: np.array([0])}

    ev = RankingEvaluator(train, test, metric=("Recall",), top_k=(5,),
                          batch_size=4)
    m = _DotModel(u_emb, i_emb)
    full = ev.evaluate(m)
    fused = ev.evaluate_fused(m, num_items=6)
    # item 0 ranks 2nd of the 2 rankable items -> recall@5 = 1.0 in both
    np.testing.assert_allclose(float(fused["Recall@5"]),
                               float(full["Recall@5"]), atol=1e-6)

    ev1 = RankingEvaluator(train, test, metric=("Recall",), top_k=(1,),
                           batch_size=4)
    assert float(ev1.evaluate(m)["Recall@1"]) == 0.0
    assert float(ev1.evaluate_fused(m, num_items=6)["Recall@1"]) == 0.0


def test_fused_mode_through_fit(tmp_path, monkeypatch):
    """eval_mode='fused' is accepted by RunConfig and drives fit()'s
    evaluations through evaluate_fused with identical metrics."""
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF

    data = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                      num_items=60, num_ratings=800, seed=3)
    params = dict(lr=0.05, reg=0.001, n_dim=8, batch_size=128, epochs=1,
                  early_stop=1)
    run_fused = RunConfig(recommender="BPRMF", data_dir=data, sep="\t",
                          metric=("NDCG", "Recall"), top_k=(10,),
                          test_batch_size=16, seed=1, eval_mode="fused")
    res_fused = BPRMF(run_fused, params).fit()
    run_full = RunConfig(recommender="BPRMF", data_dir=data, sep="\t",
                         metric=("NDCG", "Recall"), top_k=(10,),
                         test_batch_size=16, seed=1, eval_mode="full")
    res_full = BPRMF(run_full, params).fit()
    for k in res_full.metrics():
        np.testing.assert_allclose(res_fused[k], res_full[k], rtol=1e-4,
                                   atol=1e-6)


def test_auto_route_degrades_to_chunked_for_wide_factors(monkeypatch):
    """auto + huge catalog + TPU + d > 512: fused_ok must turn off (dot_topk
    asserts d <= 512) and the route must fall through to chunked."""
    rng = np.random.default_rng(0)
    n, d = 300, 520
    m = _DotModel(rng.standard_normal((4, d)), rng.standard_normal((n, d)))
    test = {x: np.array([x]) for x in range(4)}
    ev = RankingEvaluator({}, test, metric=("Recall",), top_k=(5,),
                          batch_size=4, eval_mode="auto", chunk_threshold=100)
    import skrx.eval.evaluator as ev_mod
    monkeypatch.setattr(ev_mod.jax, "default_backend", lambda: "tpu")
    called = {}
    orig = ev.evaluate_chunked
    ev.evaluate_chunked = lambda *a, **kw: called.setdefault("chunked", True) or orig(*a, **kw)
    ev.evaluate_fused = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("auto must not route d=520 to fused"))
    ev.evaluate(m)
    assert called.get("chunked")


def test_fused_rejects_model_parallel_mesh():
    """Explicit fused eval on a model-axis mesh must fail fast with a clear
    message (the kernel is not SPMD-partitionable)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from skrx.parallel import make_mesh

    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    rng = np.random.default_rng(1)
    m = _DotModel(rng.standard_normal((4, 8)), rng.standard_normal((50, 8)))
    ev = RankingEvaluator({}, {0: np.array([1])}, metric=("Recall",),
                          top_k=(5,), batch_size=4, mesh=mesh)
    with pytest.raises(AssertionError, match="single-device"):
        ev.evaluate_fused(m, num_items=50)


def test_run_config_compute_dtype_routes_to_model_config(tmp_path,
                                                         monkeypatch):
    """RunConfig.compute_dtype='bfloat16' reaches models that declare the
    field — for BOTH direct library construction and the CLI/HyperOpt path
    (one mechanism in AbstractRecommender.__init__); models without the
    field warn-and-ignore."""
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF
    from skrx.models.SASRec import SASRec

    data = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=50, num_ratings=600, seed=5)
    hp = dict(lr=0.01, hidden_units=8, max_len=8, num_blocks=1, num_heads=1,
              batch_size=32, epochs=1, early_stop=1)
    run = RunConfig(recommender="SASRec", data_dir=data, sep="\t",
                    top_k=(10,), test_batch_size=8, seed=1,
                    compute_dtype="bfloat16")
    m = SASRec(run, dict(hp))
    assert m.config.compute_dtype == "bfloat16"
    # an explicit model-level setting wins over the run-level policy
    m2 = SASRec(run, dict(hp, compute_dtype="float32"))
    assert m2.config.compute_dtype == "float32"
    # models with no bf16 path: warn-and-ignore
    run_bpr = RunConfig(recommender="BPRMF", data_dir=data, sep="\t",
                        top_k=(10,), test_batch_size=8, seed=1,
                        compute_dtype="bfloat16")
    with pytest.warns(UserWarning, match="compute_dtype"):
        b = BPRMF(run_bpr, dict(lr=0.05, reg=0.001, n_dim=8, batch_size=64,
                                epochs=1, early_stop=1))
    assert "compute_dtype" not in b.config.to_dict()


def test_fused_paged_super_chunks_match_full():
    """A tiny paged memory budget forces multiple runner calls with a
    padded tail group — metrics must equal full evaluation exactly."""
    rng = np.random.default_rng(17)
    u, n, d = 37, 500, 16            # 5 pages at bs=8, tail group padded
    m = _DotModel(rng.standard_normal((u, d)), rng.standard_normal((n, d)),
                  bias=rng.standard_normal(n))
    train = {x: rng.permutation(n)[:15] for x in range(u)}
    test = {x: rng.permutation(n)[:4] for x in range(u)}
    ev = RankingEvaluator(train, test, metric=("Precision", "Recall",
                                               "NDCG", "MRR", "MAP"),
                          top_k=(5, 10), batch_size=8)
    ev.paged_mem_budget = 1          # -> pages_per_call == 1, 5 calls
    full = ev.evaluate(m)
    fused = ev.evaluate_fused(m, num_items=n)
    for k in full.metrics():
        np.testing.assert_allclose(fused[k], full[k], rtol=1e-5, atol=1e-7)
    ev2 = RankingEvaluator(train, test, metric=("NDCG",), top_k=(10,),
                           batch_size=8)
    ev2.paged_mem_budget = 2 * 8 * (16 + 64 + 64) * 4   # ~2 pages/call
    fused2 = ev2.evaluate_fused(m, num_items=n)
    np.testing.assert_allclose(fused2["NDCG@10"], full["NDCG@10"],
                               rtol=1e-5, atol=1e-7)
    # device-table cache disabled (budget 0) must not change metrics, and
    # the lazy over-budget path must not populate the LRU
    ev2.table_cache_budget = 0
    ev2._eval_table_lru = {}
    fused3 = ev2.evaluate_fused(m, num_items=n)
    assert not ev2._eval_table_lru
    np.testing.assert_allclose(fused3["NDCG@10"], full["NDCG@10"],
                               rtol=1e-5, atol=1e-7)


def test_eval_table_lru_keeps_alternating_user_sets():
    """fit()'s valid/test alternation must not thrash the device-table
    cache: after evaluating two different user subsets the LRU holds both
    (advisor r4 — the old single-slot cache evicted every epoch)."""
    rng = np.random.default_rng(23)
    u, n, d = 24, 300, 8
    m = _DotModel(rng.standard_normal((u, d)), rng.standard_normal((n, d)))
    train = {x: rng.permutation(n)[:10] for x in range(u)}
    test = {x: rng.permutation(n)[:4] for x in range(u)}
    ev = RankingEvaluator(train, test, metric=("NDCG",), top_k=(10,),
                          batch_size=8)
    ev._evaluate_full(m, test_users=range(12))
    ev._evaluate_full(m, test_users=range(12, 24))
    assert len(ev._eval_table_lru) == 2
    keys_before = list(ev._eval_table_lru)
    r1 = ev._evaluate_full(m, test_users=range(12))
    r2 = ev._evaluate_full(m, test_users=range(12, 24))
    assert list(ev._eval_table_lru) != keys_before or \
        len(ev._eval_table_lru) == 2          # both still resident
    assert np.isfinite(r1["NDCG@10"]) and np.isfinite(r2["NDCG@10"])
