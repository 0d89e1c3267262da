"""Quality parity for the rest of the model zoo (round 2): every skrx model
matches a faithful torch-CPU implementation of the reference's training loop
(same data, same evaluator) within run-to-run variance — extending
test_quality_parity.py (BPRMF/LightGCN/MultVAE/FPMC) and
test_quality_parity_families.py (SASRec/GRU4Rec/CML/BM3) toward 26/26
measured-parity coverage.

This file: the remaining sequential towers + the heuristic baseline.

* Pop      — EXACT parity vs the NumPy metric oracle (deterministic model)
             (skrec/recommender/Pop.py:26-44)
* TransRec — translation scoring, BPR + l2_loss (TransRec.py:75-160)
* Caser    — CNN tower, sigmoid-CE on pos/neg targets, Adam weight_decay
             (Caser.py:118-203)
* HGN      — feature/instance gating, BPR sum over seq_T targets
             (HGN.py:101-207)

Criterion: two-sided, two-metric (tests/parity_utils.py) — skrx's
best-NDCG@10-epoch NDCG@10 AND Recall@10 must land inside calibrated
bands around the reference loop's (measured table: BASELINE.md).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from skrx import RunConfig
from skrx.eval import RankingEvaluator
from skrx.io import RSDataset, SequentialPairwiseIterator

from .oracle import eval_score_matrix_oracle
from .parity_utils import (assert_parity, run_seed, seed_offset,
                           track_best)

D = 16


@pytest.fixture(autouse=True)
def _seed_numpy():
    # Pin both host RNG streams per test (global numpy + the shared seeded
    # host generator used by iterator sampling/shuffles) so parity outcomes
    # depend on neither suite execution order nor process entropy.
    from skrx.utils.random import set_host_seed
    np.random.seed(20260819 + seed_offset())
    set_host_seed(20260819 + seed_offset())


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("parity3")
    path = synthetic.make_dataset_dir(str(root), num_users=120, num_items=200,
                                      num_ratings=3500, seed=13,
                                      latent_dim=4, latent_strength=8.0)
    return path, RSDataset(path, "\t", "UIRT")


def _evaluator(ds):
    return RankingEvaluator(ds.train_data.to_user_dict(),
                            ds.test_data.to_user_dict(),
                            metric=("NDCG", "Recall"), top_k=(10,), batch_size=64)


def _run(path, name):
    return RunConfig(recommender=name, data_dir=path, file_column="UIRT",
                     sep="\t", metric=("NDCG", "Recall"), top_k=(10,),
                     test_batch_size=64, seed=run_seed())


# --------------------------------------------------------------------------
# Pop — deterministic: exact metric parity vs the NumPy oracle
# --------------------------------------------------------------------------
def test_pop_exact_parity(dataset, tmp_path, monkeypatch):
    """Pop is deterministic (score = train interaction count, Pop.py:26-36),
    so parity is exact: its evaluated NDCG@10 must equal the value the NumPy
    oracle computes from popularity counts with -inf train masking."""
    monkeypatch.chdir(tmp_path)
    path, ds = dataset

    from skrx.models.Pop import Pop
    model = Pop(_run(path, "Pop"), {})
    skrx_ndcg = float(model.fit()["NDCG@10"])

    counts = np.bincount(ds.train_data.to_user_item_pairs()[:, 1],
                         minlength=ds.num_items).astype(np.float64)
    train_dict = ds.train_data.to_user_dict()
    test_dict = ds.test_data.to_user_dict()
    users = sorted(test_dict.keys())
    scores = np.tile(counts[None, :], (len(users), 1))
    out = eval_score_matrix_oracle(
        scores,
        [test_dict[u] for u in users],
        [train_dict.get(u, np.array([], dtype=np.int64)) for u in users],
        metric_ids=[4], top_k=10)
    oracle_ndcg = out[:, 0, 9].mean()
    np.testing.assert_allclose(skrx_ndcg, oracle_ndcg, rtol=2e-5)


# --------------------------------------------------------------------------
# TransRec — translation-based sequential MF
# --------------------------------------------------------------------------
class _TorchTransRec:
    """Reference-architecture TransRec (TransRec.py:55-160 semantics):
    zero-init user embeddings, normal(0.01) items/global transition, score =
    -||u + T + last - i|| + bias_i, summed BPR + reg * l2_loss over involved
    rows, Adam."""

    def __init__(self, ds, seed=0, d=D, lr=0.01, reg=0.01):
        torch.manual_seed(seed)
        self.ds, self.reg = ds, reg
        self.ue = torch.nn.Embedding(ds.num_users, d)
        self.ie = torch.nn.Embedding(ds.num_items, d)
        self.bias = torch.nn.Embedding(ds.num_items, 1)
        self.T = torch.nn.Parameter(torch.empty(1, d))
        torch.nn.init.zeros_(self.ue.weight)
        torch.nn.init.normal_(self.ie.weight, 0.0, 0.01)
        torch.nn.init.normal_(self.T, 0.0, 0.01)
        torch.nn.init.zeros_(self.bias.weight)
        self.opt = torch.optim.Adam(
            list(self.ue.parameters()) + list(self.ie.parameters())
            + list(self.bias.parameters()) + [self.T], lr=lr)
        seqs = ds.train_data.to_user_dict_by_time()
        self._last = np.zeros(ds.num_users, dtype=np.int64)
        for u, s in seqs.items():
            self._last[u] = s[-1]

    def _score(self, u, last, items):
        trans = self.ue(u) + self.T + self.ie(last)
        return -torch.norm(trans - self.ie(items), dim=-1) \
            + self.bias(items).squeeze(-1)

    def fit_and_best(self, evaluator, epochs=15):
        it = SequentialPairwiseIterator(self.ds.train_data, num_previous=1,
                                        num_next=1, batch_size=256,
                                        shuffle=True)
        best = None
        for _ in range(epochs):
            for users, seqs, pos, neg in it:
                u = torch.from_numpy(users).long()
                last = torch.from_numpy(np.asarray(seqs).reshape(-1)).long()
                i = torch.from_numpy(np.asarray(pos).reshape(-1)).long()
                j = torch.from_numpy(np.asarray(neg).reshape(-1)).long()
                y_pos = self._score(u, last, i)
                y_neg = self._score(u, last, j)
                loss = -torch.nn.functional.logsigmoid(y_pos - y_neg).sum()
                reg = 0.5 * (self.ue(u).pow(2).sum() + self.T.pow(2).sum()
                             + self.ie(last).pow(2).sum()
                             + self.ie(i).pow(2).sum() + self.ie(j).pow(2).sum()
                             + self.bias(i).pow(2).sum()
                             + self.bias(j).pow(2).sum())
                loss = loss + self.reg * reg
                self.opt.zero_grad(); loss.backward(); self.opt.step()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            u = torch.from_numpy(np.asarray(users)).long()
            last = torch.from_numpy(self._last[np.asarray(users)]).long()
            trans = self.ue(u) + self.T + self.ie(last)      # (B, d)
            diff = trans[:, None, :] - self.ie.weight[None]  # (B, N, d)
            scores = -torch.norm(diff, dim=-1) \
                + self.bias.weight.squeeze(-1)
        return scores.numpy()


def test_transrec_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    torch_best = _TorchTransRec(ds).fit_and_best(_evaluator(ds))

    from skrx.models.TransRec import TransRec
    result = TransRec(_run(path, "TransRec"),
                      dict(lr=0.01, reg=0.01, embed_size=D, batch_size=256,
                           epochs=15, early_stop=15)).fit()
    assert_parity("transrec", result, torch_best)


# --------------------------------------------------------------------------
# Caser — horizontal/vertical CNN over the item sequence
# --------------------------------------------------------------------------
class _TorchCaser(torch.nn.Module):
    """Reference-architecture Caser (Caser.py:67-203 semantics): padded-seq
    CNN tower (nv vertical + nh-per-length horizontal filters), fc to d,
    concat user embedding, target-item W2/b2 scoring, per-target sigmoid-CE,
    Adam with weight_decay=l2_reg."""

    def __init__(self, ds, pad_idx, seed=0, d=D, L=5, nv=2, nh=4,
                 dropout=0.5):
        super().__init__()
        torch.manual_seed(seed)
        n_items = ds.num_items + 1
        self.L, self.nv, self.nh = L, nv, nh
        self.ue = torch.nn.Embedding(ds.num_users, d)
        self.ie = torch.nn.Embedding(n_items, d, padding_idx=pad_idx)
        self.conv_v = torch.nn.Conv2d(1, nv, (L, 1))
        self.conv_h = torch.nn.ModuleList(
            [torch.nn.Conv2d(1, nh, (i + 1, d)) for i in range(L)])
        self.fc1 = torch.nn.Linear(nv * d + nh * L, d)
        self.W2 = torch.nn.Embedding(n_items, 2 * d, padding_idx=pad_idx)
        self.b2 = torch.nn.Embedding(n_items, 1, padding_idx=pad_idx)
        self.dropout = torch.nn.Dropout(dropout)
        for w in (self.ue.weight, self.ie.weight, self.W2.weight):
            torch.nn.init.normal_(w, 0.0, 0.01)
        torch.nn.init.zeros_(self.b2.weight)
        with torch.no_grad():
            self.ie.weight[pad_idx] = 0.0
            self.W2.weight[pad_idx] = 0.0

    def _user_vec(self, users, seqs):
        x = self.ie(seqs).unsqueeze(1)                       # (B,1,L,d)
        out_v = self.conv_v(x).reshape(x.shape[0], -1)
        outs = []
        for conv in self.conv_h:
            c = torch.relu(conv(x).squeeze(3))
            outs.append(torch.nn.functional.max_pool1d(
                c, c.size(2)).squeeze(2))
        out = torch.cat([out_v, torch.cat(outs, 1)], 1)
        z = torch.relu(self.fc1(self.dropout(out)))
        return torch.cat([z, self.ue(users)], 1)             # (B, 2d)

    def forward(self, users, seqs, items):
        x = self._user_vec(users, seqs)
        return torch.baddbmm(self.b2(items), self.W2(items),
                             x.unsqueeze(2)).squeeze(2)

    def predict_scores(self, users, seqs):
        x = self._user_vec(users, seqs)
        return x @ self.W2.weight.T + self.b2.weight.squeeze(-1)


class _TorchCaserRunner:
    def __init__(self, ds, seed=0, L=5, T=3, lr=0.01, l2_reg=1e-6):
        self.ds, self.L, self.T = ds, L, T
        self.pad = ds.num_items
        self.net = _TorchCaser(ds, self.pad, seed=seed, L=L)
        self.opt = torch.optim.Adam(self.net.parameters(), lr=lr,
                                    weight_decay=l2_reg)
        self.seq_dict = ds.train_data.to_truncated_seq_dict(
            L, pad_value=self.pad, padding="pre", truncating="pre")

    def fit_and_best(self, evaluator, epochs=12):
        it = SequentialPairwiseIterator(self.ds.train_data,
                                        num_previous=self.L, num_next=self.T,
                                        pad=self.pad, batch_size=256,
                                        shuffle=True)
        best = None
        for _ in range(epochs):
            self.net.train()
            for users, seqs, pos, neg in it:
                u = torch.from_numpy(users).long()
                s = torch.from_numpy(np.asarray(seqs)).long()
                items = torch.from_numpy(
                    np.concatenate([pos, neg], 1)).long()
                ratings = self.net(u, s, items)
                yui, yuj = torch.split(ratings, [self.T, self.T], dim=1)
                loss = (torch.nn.functional.binary_cross_entropy_with_logits(
                            yui, torch.ones_like(yui), reduction="none")
                        + torch.nn.functional
                        .binary_cross_entropy_with_logits(
                            yuj, torch.zeros_like(yuj),
                            reduction="none")).mean()
                self.opt.zero_grad(); loss.backward(); self.opt.step()
            self.net.eval()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        seqs = np.asarray([self.seq_dict[u] for u in np.asarray(users)])
        with torch.no_grad():
            scores = self.net.predict_scores(
                torch.from_numpy(np.asarray(users)).long(),
                torch.from_numpy(seqs).long())
        return scores.numpy()[:, : self.ds.num_items]


def test_caser_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    torch_best = _TorchCaserRunner(ds, seed=seed_offset()).fit_and_best(_evaluator(ds))

    from skrx.models.Caser import Caser
    result = Caser(_run(path, "Caser"),
                   dict(lr=0.01, l2_reg=1e-6, embed_size=D, seq_L=5, seq_T=3,
                        nv=2, nh=4, dropout=0.5, batch_size=256, epochs=12,
                        early_stop=12)).fit()
    # DECISIVELY settled round 5 (scripts/parity_decisive.py, 320-user
    # fixture, 6 seeds): NDCG ratio mean 1.014, CI95 [0.958, 1.070]
    # (BASELINE.md r5); the small-fixture band stays 0.8 (sigma ~0.15).
    assert_parity("caser", result, torch_best, lower=0.8)


# --------------------------------------------------------------------------
# HGN — hierarchical feature/instance gating
# --------------------------------------------------------------------------
class _TorchHGN(torch.nn.Module):
    """Reference-architecture HGN (HGN.py:60-207 semantics): sigmoid feature
    gate, instance gate normalized by its own sum, score = MF + union-level +
    item-item terms, summed BPR over seq_T aligned pos/neg columns, Adam with
    weight_decay=reg."""

    def __init__(self, ds, pad_idx, seed=0, d=D, L=5):
        super().__init__()
        torch.manual_seed(seed)
        n_items = ds.num_items + 1
        self.ue = torch.nn.Embedding(ds.num_users, d)
        self.ie = torch.nn.Embedding(n_items, d, padding_idx=pad_idx)
        self.fg_item = torch.nn.Linear(d, d)
        self.fg_user = torch.nn.Linear(d, d)
        self.ig_item = torch.nn.Parameter(torch.empty(d, 1))
        self.ig_user = torch.nn.Parameter(torch.empty(d, L))
        self.W2 = torch.nn.Embedding(n_items, d, padding_idx=pad_idx)
        self.b2 = torch.nn.Embedding(n_items, 1, padding_idx=pad_idx)
        torch.nn.init.normal_(self.ue.weight, 0.0, 0.01)
        torch.nn.init.normal_(self.ie.weight, 0.0, 0.01)
        torch.nn.init.normal_(self.W2.weight, 0.0, 0.01)
        torch.nn.init.zeros_(self.b2.weight)
        torch.nn.init.kaiming_uniform_(self.fg_item.weight)
        torch.nn.init.kaiming_uniform_(self.fg_user.weight)
        torch.nn.init.zeros_(self.fg_item.bias)
        torch.nn.init.zeros_(self.fg_user.bias)
        torch.nn.init.xavier_uniform_(self.ig_item)
        torch.nn.init.xavier_uniform_(self.ig_user)
        with torch.no_grad():
            self.ie.weight[pad_idx] = 0.0
            self.W2.weight[pad_idx] = 0.0

    def _union(self, user_emb, item_embs):
        gate = torch.sigmoid(self.fg_item(item_embs)
                             + self.fg_user(user_emb).unsqueeze(1))
        gated = item_embs * gate
        t1 = torch.matmul(gated, self.ig_item.unsqueeze(0)).squeeze(-1)
        t2 = user_emb @ self.ig_user
        inst = torch.sigmoid(t1 + t2)                        # (B, L)
        union = (gated * inst.unsqueeze(2)).sum(1)
        return union / inst.sum(1, keepdim=True)

    def forward(self, users, seqs, items):
        item_embs = self.ie(seqs)
        user_emb = self.ue(users)
        union = self._union(user_emb, item_embs)
        w2, b2 = self.W2(items), self.b2(items)
        res = torch.baddbmm(b2, w2, user_emb.unsqueeze(2)).squeeze(2)
        res = res + torch.bmm(union.unsqueeze(1),
                              w2.permute(0, 2, 1)).squeeze(1)
        res = res + item_embs.bmm(w2.permute(0, 2, 1)).sum(1)
        return res

    def predict_scores(self, users, seqs):
        item_embs = self.ie(seqs)
        user_emb = self.ue(users)
        union = self._union(user_emb, item_embs)
        w2 = self.W2.weight
        res = user_emb @ w2.T + self.b2.weight.squeeze(-1)
        res = res + union @ w2.T
        res = res + torch.matmul(item_embs, w2.T.unsqueeze(0)).sum(1)
        return res


class _TorchHGNRunner:
    def __init__(self, ds, seed=0, L=5, T=3, lr=0.01, reg=0.001):
        self.ds, self.L, self.T = ds, L, T
        self.pad = ds.num_items
        self.net = _TorchHGN(ds, self.pad, seed=seed, L=L)
        self.opt = torch.optim.Adam(self.net.parameters(), lr=lr,
                                    weight_decay=reg)
        self.seq_dict = ds.train_data.to_truncated_seq_dict(
            L, pad_value=self.pad, padding="pre", truncating="pre")

    def fit_and_best(self, evaluator, epochs=12):
        it = SequentialPairwiseIterator(self.ds.train_data,
                                        num_previous=self.L, num_next=self.T,
                                        pad=self.pad, batch_size=256,
                                        shuffle=True)
        best = None
        for _ in range(epochs):
            self.net.train()
            for users, seqs, pos, neg in it:
                u = torch.from_numpy(users).long()
                s = torch.from_numpy(np.asarray(seqs)).long()
                items = torch.from_numpy(
                    np.concatenate([pos, neg], 1)).long()
                ratings = self.net(u, s, items)
                yui, yuj = torch.split(ratings, [self.T, self.T], dim=1)
                loss = -torch.nn.functional.logsigmoid(yui - yuj).sum()
                self.opt.zero_grad(); loss.backward(); self.opt.step()
            self.net.eval()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        seqs = np.asarray([self.seq_dict[u] for u in np.asarray(users)])
        with torch.no_grad():
            scores = self.net.predict_scores(
                torch.from_numpy(np.asarray(users)).long(),
                torch.from_numpy(seqs).long())
        return scores.numpy()[:, : self.ds.num_items]


def test_hgn_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    torch_best = _TorchHGNRunner(ds).fit_and_best(_evaluator(ds))

    from skrx.models.HGN import HGN
    result = HGN(_run(path, "HGN"),
                 dict(lr=0.01, reg=0.001, embed_size=D, seq_L=5, seq_T=3,
                      batch_size=256, epochs=12, early_stop=12)).fit()
    assert_parity("hgn", result, torch_best)
