"""End-to-end leave-one-out flow: preprocessor split -> evaluator
auto-adaptation (Recall == HitRatio, MAP == MRR)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skrx import RunConfig


def test_leave_one_out_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from skrx.io import synthetic
    from skrx.models.BPRMF import BPRMF
    data = synthetic.make_dataset_dir(str(tmp_path), num_users=60,
                                      num_items=90, num_ratings=1500, seed=17,
                                      split="leave_out")
    run = RunConfig(recommender="BPRMF", data_dir=data, file_column="UIRT",
                    sep="\t", metric=("Recall", "MAP", "MRR", "NDCG"),
                    top_k=(10,),
                    test_batch_size=32, seed=1)
    m = BPRMF(run, dict(lr=0.05, n_dim=8, batch_size=128, epochs=3,
                        early_stop=3))
    result = m.fit()
    # every test user has exactly one held-out item
    test_dict = m.dataset.test_data.to_user_dict()
    assert all(len(v) == 1 for v in test_dict.values())
    # leave-one-out identities (reference evaluator docstring,
    # evaluator.py:75-79): MAP == MRR; Recall in [0,1] is the hit ratio
    np.testing.assert_allclose(result["MAP@10"], result["MRR@10"], rtol=1e-6)
    assert 0.0 <= result["Recall@10"] <= 1.0
