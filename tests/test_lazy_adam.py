import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from skrx.ops.optim import dedup_rows, lazy_adam_init, lazy_adam_row_update


def test_dedup_rows_sums_duplicates():
    rows = jnp.asarray(np.array([3, 1, 3, 7, 1, 100], np.int32))  # 100 = drop
    grads = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    uniq, summed = dedup_rows(rows, grads, drop_id=100)
    uniq = np.asarray(uniq)
    summed = np.asarray(summed)
    mapping = {int(u): summed[i] for i, u in enumerate(uniq) if u < 100}
    np.testing.assert_allclose(mapping[1], grads[1] + grads[4])
    np.testing.assert_allclose(mapping[3], grads[0] + grads[2])
    np.testing.assert_allclose(mapping[7], grads[3])


def test_lazy_adam_matches_dense_on_touched_rows():
    rng = np.random.default_rng(0)
    n, d, k = 50, 8, 12
    table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    rows = jnp.asarray(rng.choice(n, k, replace=False).astype(np.int32))
    g_rows = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))

    # dense optax adam with a dense gradient that is zero off the rows
    dense_g = jnp.zeros_like(table).at[rows].set(g_rows)
    opt = optax.adam(0.01)
    s = opt.init(table)
    up, _ = opt.update(dense_g, s, table)
    dense_next = optax.apply_updates(table, up)

    state = lazy_adam_init(table)
    state, lazy_next = lazy_adam_row_update(state, table, rows, g_rows, 0.01)

    np.testing.assert_allclose(np.asarray(lazy_next)[np.asarray(rows)],
                               np.asarray(dense_next)[np.asarray(rows)],
                               rtol=1e-5, atol=1e-6)
    # untouched rows unchanged under lazy adam
    untouched = np.setdiff1d(np.arange(n), np.asarray(rows))
    np.testing.assert_array_equal(np.asarray(lazy_next)[untouched],
                                  np.asarray(table)[untouched])
    assert np.asarray(state.counts)[np.asarray(rows)].min() == 1


def test_lazy_adam_duplicates_equal_summed_grads():
    table = jnp.ones((10, 4))
    rows = jnp.asarray(np.array([2, 2, 5], np.int32))
    g = jnp.asarray(np.ones((3, 4), np.float32))
    state = lazy_adam_init(table)
    _, next_dup = lazy_adam_row_update(state, table, rows, g, 0.1)
    _, next_sum = lazy_adam_row_update(
        lazy_adam_init(table), table, jnp.asarray(np.array([2, 5], np.int32)),
        jnp.asarray(np.array([[2.0] * 4, [1.0] * 4], np.float32)), 0.1)
    np.testing.assert_allclose(np.asarray(next_dup), np.asarray(next_sum),
                               rtol=1e-6)


def test_bprmf_lazy_adam_learns(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF
    data = synthetic.make_dataset_dir(str(tmp_path), num_users=80,
                                      num_items=150, num_ratings=2000,
                                      seed=21, latent_dim=4,
                                      latent_strength=8.0)
    run = RunConfig(recommender="BPRMF", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=32, seed=1)
    m = BPRMF(run, dict(lr=0.02, reg=0.001, n_dim=16, batch_size=256,
                        epochs=10, early_stop=10, optimizer="lazy_adam"))
    result = m.fit()
    assert result["NDCG@10"] > 0.10


@pytest.mark.parametrize("name,params", [
    ("FPMC", dict(lr=0.05, reg=0.01, embed_size=16, batch_size=256,
                  epochs=4, early_stop=4)),
    ("TransRec", dict(lr=0.05, reg=0.01, embed_size=16, batch_size=256,
                      epochs=4, early_stop=4)),
])
def test_generic_lazy_adam_learns(name, params, tmp_path, monkeypatch):
    """make_lazy_train_step (skrx/ops/optim.py) drives FPMC/TransRec:
    trains to metrics in the same range as dense Adam (SparseAdam untouched-
    row semantics forbid exact equality) and beats chance."""
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.utils import ModelRegistry

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=60,
                                          num_items=100, num_ratings=1800,
                                          seed=5, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender=name, data_dir=data_dir, file_column="UIRT",
                   sep="\t", metric=("Recall", "NDCG"), top_k=(10,),
                   test_batch_size=32, seed=2021)
    reg = ModelRegistry(); reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)
    res_dense = cls(rc, dict(params, optimizer="adam")).fit()
    res_lazy = cls(rc, dict(params, optimizer="lazy_adam")).fit()
    assert np.isfinite(res_lazy["NDCG@10"])
    assert res_lazy["NDCG@10"] > 0.02  # well above random on this fixture
    # same ballpark as dense Adam
    assert res_lazy["NDCG@10"] > 0.5 * res_dense["NDCG@10"]


def test_make_lazy_train_step_mixed_dense_and_sparse():
    """Generic builder with BOTH table and dense leaves: tables update only
    on touched rows; the dense leaf follows optax Adam exactly."""
    from skrx.ops.optim import make_lazy_train_step

    rng = np.random.default_rng(0)
    n, d = 40, 4
    params = {"emb": jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)),
              "w": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))}

    def loss_fn(gathered, dense, batch):
        rows_emb, = gathered
        h = rows_emb @ dense["w"]
        return jnp.sum(h ** 2)

    gathers = [("emb", lambda b: b)]
    step, opt_state = make_lazy_train_step(0.01, gathers, loss_fn, params)
    batch = jnp.asarray(np.array([3, 7, 3], np.int32))  # duplicate row 3
    (new_params, _), loss = jax.jit(step)((params, opt_state), batch)
    assert np.isfinite(float(loss))

    # untouched embedding rows unchanged
    touched = {3, 7}
    emb0, emb1 = np.asarray(params["emb"]), np.asarray(new_params["emb"])
    for r in range(n):
        if r in touched:
            assert not np.allclose(emb0[r], emb1[r])
        else:
            np.testing.assert_array_equal(emb0[r], emb1[r])

    # dense leaf matches a reference optax Adam step on the same gradient
    import optax
    def dense_loss(w):
        return jnp.sum((params["emb"][batch] @ w) ** 2)
    g = jax.grad(dense_loss)(params["w"])
    opt = optax.adam(0.01)
    upd, _ = opt.update({"w": g}, opt.init({"w": params["w"]}),
                        {"w": params["w"]})
    ref_w = optax.apply_updates({"w": params["w"]}, upd)["w"]
    np.testing.assert_allclose(np.asarray(new_params["w"]), np.asarray(ref_w),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("name,params", [
    ("HGN", dict(lr=0.05, reg=0.001, seq_L=4, seq_T=2, embed_size=16,
                 batch_size=256, epochs=4, early_stop=4)),
    ("Caser", dict(lr=0.05, l2_reg=0.001, embed_size=16, seq_L=4, seq_T=2,
                   nv=2, nh=4, batch_size=256, epochs=4, early_stop=4)),
])
def test_mixed_lazy_adam_models_learn(name, params, tmp_path, monkeypatch):
    """Mixed dense+sparse lazy path (dense conv/gate leaves + embedding
    tables; weight decay on touched rows; Caser threads a dropout key)."""
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.utils import ModelRegistry

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=60,
                                          num_items=100, num_ratings=1800,
                                          seed=5, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender=name, data_dir=data_dir, file_column="UIRT",
                   sep="\t", metric=("Recall", "NDCG"), top_k=(10,),
                   test_batch_size=32, seed=2021)
    reg = ModelRegistry(); reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)
    res_dense = cls(rc, dict(params, optimizer="adam")).fit()
    res_lazy = cls(rc, dict(params, optimizer="lazy_adam")).fit()
    assert np.isfinite(res_lazy["NDCG@10"])
    assert res_lazy["NDCG@10"] > 0.02
    assert res_lazy["NDCG@10"] > 0.5 * res_dense["NDCG@10"]
