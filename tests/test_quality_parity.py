"""Quality parity: skrx BPRMF matches a faithful torch-CPU implementation of
the reference's training loop (same config, same data) within run-to-run
variance. This is the strongest parity check available in this image (the
reference itself cannot be built — its Cython extensions need Cython)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from skrx import RunConfig
from skrx.eval import RankingEvaluator
from skrx.io import PairwiseIterator, RSDataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("parity")
    path = synthetic.make_dataset_dir(str(root), num_users=120, num_items=200,
                                      num_ratings=3500, seed=13,
                                      latent_dim=4, latent_strength=8.0)
    return path, RSDataset(path, "\t", "UIRT")


CFG = dict(lr=0.01, reg=0.01, n_dim=16, batch_size=256, epochs=15,
           early_stop=15)


class _TorchBPRMF:
    """Reference-architecture BPRMF (BPRMF.py:52-147 semantics)."""

    def __init__(self, ds, seed=0):
        torch.manual_seed(seed)
        self.ds = ds
        d = CFG["n_dim"]
        self.user_emb = torch.nn.Embedding(ds.num_users, d)
        self.item_emb = torch.nn.Embedding(ds.num_items, d)
        self.item_bias = torch.nn.Embedding(ds.num_items, 1)
        torch.nn.init.normal_(self.user_emb.weight, 0.0, 0.01)
        torch.nn.init.normal_(self.item_emb.weight, 0.0, 0.01)
        torch.nn.init.zeros_(self.item_bias.weight)
        self.opt = torch.optim.Adam(
            list(self.user_emb.parameters()) + list(self.item_emb.parameters())
            + list(self.item_bias.parameters()), lr=CFG["lr"])

    def fit_and_best(self, evaluator):
        it = PairwiseIterator(self.ds.train_data, batch_size=CFG["batch_size"],
                              shuffle=True)
        best = -1.0
        for _ in range(CFG["epochs"]):
            for users, pos, neg in it:
                u = torch.from_numpy(users).long()
                i = torch.from_numpy(pos).long()
                j = torch.from_numpy(np.asarray(neg)).long()
                ue, pe, ne = self.user_emb(u), self.item_emb(i), self.item_emb(j)
                y_pos = (ue * pe).sum(-1) + self.item_bias(i).squeeze(-1)
                y_neg = (ue * ne).sum(-1) + self.item_bias(j).squeeze(-1)
                loss = -torch.nn.functional.logsigmoid(y_pos - y_neg).sum()
                reg = 0.5 * (ue.pow(2).sum() + pe.pow(2).sum() + ne.pow(2).sum()
                             + self.item_bias(i).pow(2).sum()
                             + self.item_bias(j).pow(2).sum())
                loss = loss + CFG["reg"] * reg
                self.opt.zero_grad()
                loss.backward()
                self.opt.step()
            best = max(best, evaluator.evaluate(self)["NDCG@10"])
        return best

    def predict(self, users):
        with torch.no_grad():
            u = torch.from_numpy(np.asarray(users)).long()
            scores = self.user_emb(u) @ self.item_emb.weight.T \
                + self.item_bias.weight.squeeze(-1)
        return scores.numpy()


def test_bprmf_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    evaluator = RankingEvaluator(ds.train_data.to_user_dict(),
                                 ds.test_data.to_user_dict(),
                                 metric=("NDCG",), top_k=(10,), batch_size=64)
    torch_best = _TorchBPRMF(ds).fit_and_best(evaluator)

    from skrx.models.BPRMF import BPRMF
    run = RunConfig(recommender="BPRMF", data_dir=path, file_column="UIRT",
                    sep="\t", metric=("NDCG",), top_k=(10,),
                    test_batch_size=64, seed=2021)
    skrx_best = BPRMF(run, dict(CFG))
    result = skrx_best.fit()
    skrx_ndcg = result["NDCG@10"]

    # parity within run-to-run variance (different RNG streams): the TPU-
    # native implementation must reach at least 90% of the reference loop's
    # best NDCG@10 (and typically exceeds it)
    assert skrx_ndcg > 0.9 * torch_best, (skrx_ndcg, torch_best)
