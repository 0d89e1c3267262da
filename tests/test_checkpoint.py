"""Checkpoint / resume: training can be interrupted and resumed with
identical parameters and continued schedule."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("ckpt")
    return synthetic.make_dataset_dir(str(root), num_users=40, num_items=60,
                                      num_ratings=800, seed=4)


def _cfg(data_dir, ckpt_dir, **over):
    base = dict(recommender="BPRMF", data_dir=data_dir, file_column="UIRT",
                sep="\t", metric=("NDCG",), top_k=(10,), test_batch_size=32,
                seed=2021, checkpoint_dir=ckpt_dir, checkpoint_every=1)
    base.update(over)
    return RunConfig(**base)


def test_checkpoint_resume_reproduces_full_run(data_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.models.BPRMF import BPRMF
    params = dict(lr=0.05, reg=0.001, n_dim=8, batch_size=128, epochs=6,
                  early_stop=10)
    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")

    # uninterrupted 6-epoch run
    full = BPRMF(_cfg(data_dir, ckpt_a), params)
    full.fit()
    full_params = jax.tree_util.tree_map(np.asarray, full.params)

    # 3 epochs, then resume for the remaining 3
    p3 = dict(params, epochs=3)
    m1 = BPRMF(_cfg(data_dir, ckpt_b), p3)
    m1.fit()
    m2 = BPRMF(_cfg(data_dir, ckpt_b, resume=True), params)
    m2.fit()
    resumed_params = jax.tree_util.tree_map(np.asarray, m2.params)

    for k in full_params:
        np.testing.assert_allclose(resumed_params[k], full_params[k],
                                   rtol=1e-5, atol=1e-6)


def test_checkpointer_roundtrip(tmp_path):
    from skrx.utils.checkpoint import Checkpointer
    import jax.numpy as jnp

    ck = Checkpointer(str(tmp_path / "c"), keep=2)
    assert ck.latest_step() is None
    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    for step in (0, 1, 2):
        ck.save(step, state, {"epoch": step})
    assert ck.latest_step() == 2
    restored, extra, step = ck.restore(state)
    assert step == 2 and extra["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5.0))
    # keep=2 garbage-collects step 0
    assert 0 not in ck._steps()


def test_checkpoint_resume_lazy_adam_fpmc(data_dir, tmp_path, monkeypatch):
    """Resume determinism with the generic lazy-Adam opt state (dict of
    LazyAdamState NamedTuples + optax state): interrupted FPMC reproduces
    the uninterrupted parameters."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.FPMC import FPMC
    params = dict(lr=0.05, reg=0.001, embed_size=8, batch_size=128, epochs=6,
                  early_stop=10, optimizer="lazy_adam")
    ckpt_a = str(tmp_path / "ckpt_la")
    ckpt_b = str(tmp_path / "ckpt_lb")

    full = FPMC(_cfg(data_dir, ckpt_a, recommender="FPMC"), params)
    full.fit()
    full_params = jax.tree_util.tree_map(np.asarray, full.params)

    p3 = dict(params, epochs=3)
    m1 = FPMC(_cfg(data_dir, ckpt_b, recommender="FPMC"), p3)
    m1.fit()
    m2 = FPMC(_cfg(data_dir, ckpt_b, recommender="FPMC", resume=True), params)
    m2.fit()
    resumed = jax.tree_util.tree_map(np.asarray, m2.params)

    for k in full_params:
        np.testing.assert_allclose(resumed[k], full_params[k], rtol=1e-5,
                                   atol=1e-6)


def test_multvae_resume_restores_anneal_counter(data_dir, tmp_path,
                                                monkeypatch):
    """The KL-anneal update counter rides in the checkpoint: a resumed run
    continues annealing where the interrupted run stopped."""
    monkeypatch.chdir(tmp_path)
    from skrx.models.MultVAE import MultVAE
    params = dict(lr=0.01, p_dims=[8], batch_size=64, epochs=4, early_stop=10,
                  anneal_steps=100, anneal_cap=0.5)
    ckpt = str(tmp_path / "ckpt_vae")
    m1 = MultVAE(_cfg(data_dir, ckpt, recommender="MultVAE",
                      **{}), dict(params, epochs=2))
    m1.fit()
    count_at_stop = float(m1._update_count)
    assert count_at_stop > 0
    m2 = MultVAE(_cfg(data_dir, ckpt, recommender="MultVAE", resume=True),
                 params)
    assert float(m2._update_count) == 0.0
    m2.fit()
    assert float(m2._update_count) > count_at_stop
