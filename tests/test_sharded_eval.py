"""Mesh-sharded evaluation produces identical metrics to single-device."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from skrx.eval import RankingEvaluator
from skrx.parallel import make_mesh


class _FakeModel:
    def __init__(self, scores):
        self._scores = scores

    def predict(self, users):
        return jnp.asarray(self._scores[np.asarray(users)])


def _setup(seed=0, num_users=64, num_items=200):
    rng = np.random.default_rng(seed)
    scores = rng.standard_normal((num_users, num_items)).astype(np.float32)
    train = {u: rng.permutation(num_items)[:10] for u in range(num_users)}
    test = {u: rng.permutation(num_items)[:5] for u in range(num_users)}
    return scores, train, test


def test_sharded_eval_matches_single_device():
    scores, train, test = _setup()
    model = _FakeModel(scores)
    kwargs = dict(metric=("Precision", "Recall", "NDCG"), top_k=(5, 10),
                  batch_size=16)
    single = RankingEvaluator(train, test, **kwargs).evaluate(model)
    mesh = make_mesh((8, 1))
    sharded = RankingEvaluator(train, test, mesh=mesh, **kwargs).evaluate(model)
    for m in single.metrics():
        np.testing.assert_allclose(sharded[m], single[m], rtol=1e-5)


def test_profile_dir_writes_trace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.Pop import Pop
    from skrx.models.BPRMF import BPRMF
    data = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=40, num_ratings=500, seed=2)
    prof = tmp_path / "prof"
    cfg = RunConfig(recommender="BPRMF", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=16, seed=1, profile_dir=str(prof))
    m = BPRMF(cfg, dict(lr=0.05, n_dim=8, batch_size=64, epochs=3,
                        early_stop=3))
    m.fit()
    assert prof.exists() and any(prof.rglob("*"))


def test_chunked_merge_pallas_under_mesh_matches_xla():
    """Round 5: the chunked-eval merge under a mesh runs per-device inside
    shard_map; forcing the Pallas kernels (interpret mode) must reproduce
    the XLA path's metrics exactly."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    import jax.numpy as jnp
    from skrx.parallel import make_mesh

    class _Dot:
        num_items = 300

        def __init__(self, u, i):
            self.u, self.i = jnp.asarray(u), jnp.asarray(i)

        def predict(self, users):
            return self.u[np.asarray(users)] @ self.i.T

        def predict_chunk(self, users, lo, hi):
            return self.u[np.asarray(users)] @ self.i[lo:hi].T

    rng = np.random.default_rng(5)
    m = _Dot(rng.standard_normal((24, 8)).astype(np.float32),
             rng.standard_normal((300, 8)).astype(np.float32))
    train = {x: rng.permutation(300)[:12] for x in range(24)}
    test = {x: rng.permutation(300)[:5] for x in range(24)}
    mesh = make_mesh()
    ev = RankingEvaluator(train, test, metric=("Precision", "Recall", "NDCG",
                                               "MRR", "MAP"),
                          top_k=(5, 10), batch_size=8, mesh=mesh)
    r_xla = ev.evaluate_chunked(m, num_items=300, chunk_size=64)
    ev._force_pallas_eval = True
    ev._chunked_fns_cache = None
    r_pal = ev.evaluate_chunked(m, num_items=300, chunk_size=64)
    for k in r_xla.metrics():
        np.testing.assert_array_equal(r_pal[k], r_xla[k])
