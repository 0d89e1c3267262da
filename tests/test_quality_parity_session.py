"""Quality parity, round 2 batch 4 (toward 26/26 coverage):

* GRU4RecPlus — session walker + popularity^alpha sampled extra negatives,
                BPR-max loss with softmax-weighted negatives
                (GRU4RecPlus.py:95-235)
* CDAE        — denoising autoencoder over corrupted user vectors with
                per-user sampled negatives (CDAE.py:66-224)
* AOBPR       — EXACT sequential reimplementation of the reference's Cython
                SGD kernel (pyx_aobpr_func.pyx:30-143) in NumPy, vs skrx's
                documented vectorized reformulation

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
from skrx.io import RSDataset
from skrx.utils.random import randint_choice
from .parity_utils import assert_parity, track_best

D = 16


@pytest.fixture(autouse=True)
def _seed_numpy():
    from skrx.utils.random import set_host_seed
    np.random.seed(20260819)
    set_host_seed(20260819)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("parity6")
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
                     test_batch_size=64, seed=2021)


# --------------------------------------------------------------------------
# GRU4RecPlus — BPR-max with sampled extra negatives
# --------------------------------------------------------------------------
class _TorchGRU4RecPlus(torch.nn.Module):
    """Reference-architecture GRU4Rec+ (GRU4RecPlus.py:95-235 semantics):
    session-parallel walker, n_sample popularity^alpha extra negatives
    appended to each step's in-batch targets, BPR-max loss with the diagonal
    masked out of the negative softmax + bpr_reg weighted logit^2 term."""

    def __init__(self, ds, seed=0, n_sample=32, alpha=0.75, bpr_reg=1.0):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.n_sample, self.bpr_reg = ds, n_sample, bpr_reg
        self.in_emb = torch.nn.Embedding(ds.num_items, D)
        self.out_emb = torch.nn.Embedding(ds.num_items, D)
        self.out_bias = torch.nn.Parameter(torch.zeros(ds.num_items))
        for e in (self.in_emb, self.out_emb):
            torch.nn.init.trunc_normal_(e.weight, std=0.01)
        self.cell = torch.nn.GRUCell(D, D)
        self.opt = torch.optim.Adam(self.parameters(), lr=0.05)

        data_ui = ds.train_data.to_user_item_pairs_by_time()
        _, idx = np.unique(data_ui[:, 0], return_index=True)
        offsets = np.zeros(len(idx) + 1, dtype=np.int64)
        offsets[:-1] = np.sort(idx)
        offsets[-1] = len(data_ui)
        self._items_flat = data_ui[:, 1].astype(np.int32)
        self._offsets = offsets
        self._n_sessions = len(offsets) - 1
        self._user_seqs = dict(ds.train_data.to_user_dict_by_time())
        # popularity^alpha inverse-CDF sampler (GRU4RecPlus.py:102-106)
        pop = np.bincount(data_ui[:, 1],
                          minlength=ds.num_items).astype(np.float64)
        pop = np.power(pop, alpha)
        cum = np.cumsum(pop)
        self._pop_cumsum = cum / cum[-1]

    def _bpr_max(self, logits):
        b, sy = logits.shape
        hm = 1.0 - torch.eye(b, sy)
        masked = logits * hm
        masked = masked - masked.max(1, keepdim=True)[0]
        e_x = torch.exp(masked) * hm
        softmax = e_x / e_x.sum(1, keepdim=True)
        pos = logits.diagonal()[:, None]
        prob = (torch.sigmoid(pos - logits) * softmax).sum(1)
        loss = -torch.log(prob + 1e-24)
        reg = (logits.pow(2) * softmax).sum(1)
        return (loss + self.bpr_reg * reg).mean()

    def fit_and_best(self, evaluator, epochs=15, bs=16):
        from skrx.models.GRU4Rec import build_walker_schedule
        best = None
        for ep in range(epochs):
            rng = np.random.default_rng((123, ep))
            perm = rng.permutation(self._n_sessions)
            in_s, out_s, resets = build_walker_schedule(
                self._items_flat, self._offsets, perm, bs)
            state = torch.zeros(bs, D)
            for t in range(len(in_s)):
                reset = torch.from_numpy(resets[t].astype(np.float32))[:, None]
                state = state.detach() * (1 - reset)
                x = self.in_emb(torch.from_numpy(in_s[t].astype(np.int64)))
                state = self.cell(x, state)
                neg = np.searchsorted(self._pop_cumsum,
                                      np.random.rand(self.n_sample))
                out = torch.from_numpy(np.concatenate(
                    [out_s[t].astype(np.int64), neg.astype(np.int64)]))
                logits = state @ self.out_emb(out).T + self.out_bias[out]
                loss = self._bpr_max(logits)
                self.opt.zero_grad(); loss.backward(); self.opt.step()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            scores = np.zeros((len(users), self.ds.num_items), np.float32)
            for r, u in enumerate(np.asarray(users)):
                seq = self._user_seqs.get(int(u))
                if seq is None or not len(seq):
                    continue
                state = torch.zeros(1, D)
                for it in seq:
                    state = self.cell(self.in_emb(
                        torch.tensor([int(it)])), state)
                scores[r] = (state @ self.out_emb.weight.T
                             + self.out_bias).numpy()[0]
        return scores


def test_gru4recplus_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    torch_best = _TorchGRU4RecPlus(ds).fit_and_best(_evaluator(ds))

    from skrx.models.GRU4RecPlus import GRU4RecPlus
    result = GRU4RecPlus(_run(path, "GRU4RecPlus"),
                         dict(lr=0.05, layers=[D], loss="bpr_max",
                              bpr_reg=1.0, n_sample=32, sample_alpha=0.75,
                              batch_size=16, epochs=15,
                              early_stop=15)).fit()
    assert_parity("gru4recplus", result, torch_best)


# --------------------------------------------------------------------------
# CDAE — denoising autoencoder with per-user sampled negatives
# --------------------------------------------------------------------------
class _TorchCDAE(torch.nn.Module):
    """Reference-architecture CDAE (CDAE.py:66-224 semantics): per-user
    negatives are ADDED to the corrupted input vector, sparse dropout with
    keep=1-dropout, sigmoid hidden activation, summed sigmoid-CE over
    pos/neg targets + reg * l2 over touched rows."""

    def __init__(self, ds, seed=0, d=D, dropout=0.5, num_neg=5, reg=0.001):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.dropout = ds, dropout
        self.num_neg, self.reg = num_neg, reg
        self.en = torch.nn.Embedding(ds.num_items, d)
        self.en_offset = torch.nn.Parameter(torch.zeros(d))
        self.de = torch.nn.Embedding(ds.num_items, d)
        self.de_bias = torch.nn.Embedding(ds.num_items, 1)
        self.ue = torch.nn.Embedding(ds.num_users, d)
        torch.nn.init.normal_(self.en.weight, 0.0, 0.01)
        torch.nn.init.normal_(self.de.weight, 0.0, 0.01)
        torch.nn.init.zeros_(self.de_bias.weight)
        torch.nn.init.normal_(self.ue.weight, 0.0, 0.01)
        self.train_mat = np.zeros((ds.num_users, ds.num_items), np.float32)
        pairs = ds.train_data.to_user_item_pairs()
        self.train_mat[pairs[:, 0], pairs[:, 1]] = 1.0

    def _encode(self, users, x, training):
        if training:
            keep = 1.0 - self.dropout
            mask = (torch.rand_like(x) < keep).float()
            x = x * mask / keep
        hidden = x @ self.en.weight + self.ue(users) + self.en_offset
        return torch.sigmoid(hidden)

    def fit_and_best(self, evaluator, epochs=15, lr=0.01, bs=64):
        opt = torch.optim.Adam(self.parameters(), lr=lr)
        users_all = np.nonzero(self.train_mat.sum(1) > 0)[0]
        best = None
        for _ in range(epochs):
            self.train()
            order = users_all.copy()
            np.random.shuffle(order)
            for lo in range(0, len(order), bs):
                bat_users = order[lo: lo + bs]
                x = self.train_mat[bat_users].copy()
                items, labels, idxs = [], [], []
                for bi, u in enumerate(bat_users):
                    pos = np.nonzero(self.train_mat[u])[0]
                    neg = randint_choice(self.ds.num_items,
                                         size=len(pos) * self.num_neg,
                                         replace=True, exclusion=pos)
                    neg = np.unique(np.atleast_1d(neg))
                    x[bi, neg] = 1.0
                    items.append(pos); labels.append(np.ones(len(pos)))
                    items.append(neg); labels.append(np.zeros(len(neg)))
                    idxs.append(np.full(len(pos) + len(neg), bi))
                items = torch.from_numpy(np.concatenate(items)).long()
                labels = torch.from_numpy(
                    np.concatenate(labels).astype(np.float32))
                idxs = torch.from_numpy(np.concatenate(idxs)).long()
                u_t = torch.from_numpy(bat_users).long()
                hidden = self._encode(u_t, torch.from_numpy(x), True)
                ratings = (hidden[idxs] * self.de(items)).sum(-1) \
                    + self.de_bias(items).squeeze(-1)
                loss = torch.nn.functional.binary_cross_entropy_with_logits(
                    ratings, labels, reduction="sum")
                uniq = torch.unique(items)
                reg = 0.5 * (self.en(uniq).pow(2).sum()
                             + self.en_offset.pow(2).sum()
                             + self.ue(u_t).pow(2).sum()
                             + self.de(uniq).pow(2).sum()
                             + self.de_bias(uniq).pow(2).sum())
                loss = loss + self.reg * reg
                opt.zero_grad(); loss.backward(); opt.step()
            self.eval()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            u = torch.from_numpy(np.asarray(users)).long()
            x = torch.from_numpy(self.train_mat[np.asarray(users)])
            hidden = self._encode(u, x, False)
            return (hidden @ self.de.weight.T
                    + self.de_bias.weight.view(1, -1)).numpy()


def test_cdae_quality_parity(dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    torch_best = _TorchCDAE(ds).fit_and_best(_evaluator(ds))

    from skrx.models.CDAE import CDAE
    result = CDAE(_run(path, "CDAE"),
                  dict(lr=0.01, reg=0.001, hidden_dim=D, dropout=0.5,
                       num_neg=5, hidden_act="sigmoid",
                       loss_func="sigmoid_cross_entropy", batch_size=64,
                       epochs=15, early_stop=15)).fit()
    assert_parity("cdae", result, torch_best)


# --------------------------------------------------------------------------
# AOBPR — exact NumPy port of the sequential Cython SGD kernel
# --------------------------------------------------------------------------
class _NumpyAOBPR:
    """Scalar-faithful reimplementation of the reference kernel
    (pyx_aobpr_func.pyx:30-143 + AOBPR.py:50-97): U[0,1) embeddings,
    rank-probability exp(-rank/alpha), per-interaction factor sampling by
    |u_f|*std_f, rank-biased negative from per-factor argsort tables
    re-sorted every N*log(N) steps, interleaved per-dimension BPR SGD
    (each row update sees the just-updated user row)."""

    def __init__(self, ds, d=D, alpha=50, lr=0.05, reg=0.01):
        self.ds, self.lr, self.reg = ds, lr, reg
        self.U = np.random.uniform(size=(ds.num_users, d)).astype(np.float32)
        self.I = np.random.uniform(size=(ds.num_items, d)).astype(np.float32)
        rank = np.arange(1, ds.num_items + 1)
        rp = np.exp(-rank / float(alpha))
        self.rank_prob = rp / rp.sum()
        pairs = ds.train_data.to_user_item_pairs()
        self.users = pairs[:, 0].astype(np.int64)
        self.pos = pairs[:, 1].astype(np.int64)

    def _epoch(self):
        n_items = self.ds.num_items
        num_loop = int(n_items * np.log(n_items))
        rank_idx = np.asarray(randint_choice(
            n_items, size=len(self.users), replace=True, p=self.rank_prob))
        order = np.arange(len(self.users))
        np.random.shuffle(order)
        users, pos, lr, reg = self.users[order], self.pos[order], \
            self.lr, self.reg
        sorted_items = np.argsort(-self.I, axis=0)
        std = self.I.std(axis=0)
        for idx in range(len(users)):
            if (idx + 1) % num_loop == 0:
                sorted_items = np.argsort(-self.I, axis=0)
                std = self.I.std(axis=0)
            u_row = self.U[users[idx]]
            fprob = np.abs(u_row) * std
            fprob = fprob / fprob.sum()
            factor = np.random.choice(len(fprob), p=fprob)
            if u_row[factor] > 0:
                neg = sorted_items[rank_idx[idx], factor]
            else:
                neg = sorted_items[n_items - rank_idx[idx] - 1, factor]
            i_row, j_row = self.I[pos[idx]], self.I[neg]
            xuij = float(u_row @ i_row - u_row @ j_row)
            cmg = 1.0 / (1.0 + np.exp(xuij))
            u_new = u_row + lr * (cmg * (i_row - j_row) - reg * u_row)
            i_new = i_row + lr * (cmg * u_new - reg * i_row)
            j_new = j_row + lr * (-cmg * u_new - reg * j_row)
            self.U[users[idx]] = u_new
            self.I[pos[idx]] = i_new
            self.I[neg] = j_new

    def fit_and_best(self, evaluator, epochs=15):
        best = None
        for _ in range(epochs):
            self._epoch()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        return self.U[np.asarray(users)] @ self.I.T


def test_aobpr_quality_parity(dataset, tmp_path, monkeypatch):
    """The strongest available check of SURVEY 2.2's AOBPR deviation target
    ('exact step-for-step sequential semantics cannot be SPMD — match
    metrics'): skrx's vectorized minibatch reformulation vs an exact NumPy
    port of the sequential kernel."""
    monkeypatch.chdir(tmp_path)
    path, ds = dataset
    ref_best = _NumpyAOBPR(ds).fit_and_best(_evaluator(ds))

    from skrx.models.AOBPR import AOBPR

    result = AOBPR(_run(path, "AOBPR"),
                   dict(lr=0.05, reg=0.01, embed_size=D, alpha=50,
                        batch_size=256, epochs=15, early_stop=15)).fit()
    # AOBPR is a DOCUMENTED deviation (vectorized rank-sampling
    # reformulation, DEVIATIONS.md) measured consistently better than the
    # reference loop (1.47x round 3) — wider upper band
    assert_parity("aobpr", result, ref_best, upper=2.0)
