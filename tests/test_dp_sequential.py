"""Data-parallel mesh wiring for the custom-epoch-loop trainers (SASRec,
BERT4Rec, GRU4Rec, GRU4RecPlus, SRGNN, AOBPR): training with
RunConfig.mesh_shape=(8, 1) must produce the same metrics as single-device
(same PRNG keys; _shard_batches only annotates layouts)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("dpseq")
    return synthetic.make_dataset_dir(str(root), num_users=48, num_items=64,
                                      num_ratings=1200, seed=7)


# cmp = "scores": post-epoch predictions must match to FP noise.
# cmp = "loss": the GRU walker scans hundreds of steps per epoch and Adam
# amplifies last-ulp gradient-reduction reorderings (the psum of per-shard
# dW partials) into lr-sized parameter flips, so the honest equality there is
# the per-epoch loss (identical math, FP-noise agreement: ~1e-5 relative).
CONFIGS = [
    ("SASRec", dict(lr=0.01, hidden_units=16, max_len=8, num_blocks=1,
                    num_heads=1, batch_size=16, epochs=1, early_stop=3),
     "scores"),
    ("BERT4Rec", dict(lr=0.01, h_size=16, max_seq_len=6, n_layers=1,
                      att_heads=1, batch_size=16, epochs=1, early_stop=3,
                      verbose=1), "scores"),
    ("GRU4Rec", dict(lr=0.05, layers=[16], batch_size=16, epochs=1,
                     early_stop=3), "loss"),
    ("GRU4RecPlus", dict(lr=0.05, layers=[16], batch_size=16, n_sample=32,
                         epochs=1, early_stop=3), "loss"),
    ("SRGNN", dict(lr=0.05, hidden_size=16, batch_size=16, epochs=1,
                   early_stop=3), "scores"),
    ("AOBPR", dict(lr=0.05, embed_size=16, batch_size=64, epochs=1,
                   early_stop=3), "scores"),
]


@pytest.mark.parametrize("name,hp,cmp", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_dp_trainer_matches_single_device(name, hp, cmp, data_dir, tmp_path,
                                          monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.utils import ModelRegistry

    reg = ModelRegistry()
    reg.load_skrx_model(name)
    cls, _ = reg.get_model(name)

    def fit(mesh_shape):
        run = RunConfig(recommender=name, data_dir=data_dir,
                        file_column="UIRT", sep="\t", metric=("NDCG",),
                        top_k=(10,), test_batch_size=16, seed=1,
                        mesh_shape=mesh_shape)
        m = cls(run, dict(hp))
        assert (m.mesh is not None) == (mesh_shape is not None)
        loss = m._train_epoch(0)
        return loss, np.asarray(m.predict(np.arange(16)))

    l1, s1 = fit(None)
    l2, s2 = fit((8, 1))
    np.testing.assert_allclose(l2, l1, rtol=1e-3)
    if cmp == "scores":
        np.testing.assert_allclose(s2, s1, rtol=5e-3, atol=1e-4)
