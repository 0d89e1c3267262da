"""Quality parity for the multimodal family (round 2, toward 26/26 coverage):
skrx models match faithful torch-CPU implementations of the reference's
training loops (same data, same evaluator) within run-to-run variance.
test_quality_parity_families.py already covers BM3.

* FREEDOM — frozen blended modality kNN graph + degree-sensitive pruning
            (FREEDOM.py:85-260)
* LATTICE — learned modality graph re-built each epoch, blended with the
            frozen original (LATTICE.py:88-354)
* SLMRec  — per-modality LightGCN towers, in-batch InfoNCE main loss + FAC
            hierarchical SSL heads (SLMRec.py:72-583)
* MGCN    — behavior-guided purifier gates + attention fusion + InfoNCE
            (MGCN.py:117-361)

The torch loops use dense adjacency matmuls (exact at 100x160 scale) where
the reference uses torch.sparse. Layers the reference leaves at torch
defaults (image/text trs Linears, gates) stay at torch defaults here.

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
from skrx.io import InteractionIterator, PairwiseIterator, RSDataset
from .parity_utils import (assert_parity, run_seed, seed_offset,
                           track_best)

D = 16
K = 5  # knn_k


@pytest.fixture(autouse=True)
def _seed_numpy():
    from skrx.utils.random import set_host_seed
    np.random.seed(20260819 + seed_offset())
    set_host_seed(20260819 + seed_offset())


@pytest.fixture(scope="module")
def mm_dataset(tmp_path_factory):
    from skrx.io import synthetic
    root = tmp_path_factory.mktemp("parity5mm")
    path = synthetic.make_dataset_dir(str(root), num_users=100, num_items=160,
                                      num_ratings=3000, seed=17,
                                      latent_dim=4, latent_strength=8.0,
                                      with_mm=True, img_dim=12, txt_dim=10)
    return path, RSDataset(path, "\t", "UIRT")


def _evaluator(ds):
    return RankingEvaluator(ds.train_data.to_user_dict(),
                            ds.test_data.to_user_dict(),
                            metric=("NDCG", "Recall"), top_k=(10,), batch_size=64)


def _run(path, name):
    return RunConfig(recommender=name, data_dir=path, file_column="UIRT",
                     sep="\t", metric=("NDCG", "Recall"), top_k=(10,),
                     test_batch_size=64, seed=run_seed())


def _sym_norm_dense(ds, eps=1e-7):
    n = ds.num_users + ds.num_items
    A = np.zeros((n, n), dtype=np.float32)
    pairs = ds.train_data.to_user_item_pairs()
    A[pairs[:, 0], pairs[:, 1] + ds.num_users] = 1.0
    A[pairs[:, 1] + ds.num_users, pairs[:, 0]] = 1.0
    if eps:
        dinv = ((A > 0).sum(1) + eps) ** -0.5
    else:
        deg = A.sum(1)
        dinv = np.where(deg > 0, deg, 1.0) ** -0.5
        dinv[deg == 0] = 0.0
    return torch.from_numpy((A * dinv[:, None] * dinv[None, :])
                            .astype(np.float32))


def _knn_sym_lap(feats, k, weighted=False):
    """cosine sim -> top-k graph -> D^-1/2 A D^-1/2 (FREEDOM/LATTICE/MGCN
    helpers build_sim / build_knn_neighbourhood / normalized laplacian).
    FREEDOM normalizes the 0/1 adjacency; LATTICE/MGCN keep the sim values.
    """
    x = feats / feats.norm(dim=-1, keepdim=True)
    sim = x @ x.T
    val, ind = torch.topk(sim, k, dim=-1)
    adj = torch.zeros_like(sim).scatter_(-1, ind, val if weighted
                                         else torch.ones_like(val))
    if weighted:
        rowsum = adj.sum(-1)
        dinv = rowsum.pow(-0.5)
        dinv[torch.isinf(dinv)] = 0.0
        return adj * dinv[:, None] * dinv[None, :]
    rowsum = adj.sum(-1) + 1e-7
    dinv = rowsum.pow(-0.5)
    return adj * dinv[:, None] * dinv[None, :]


# --------------------------------------------------------------------------
# FREEDOM
# --------------------------------------------------------------------------
class _TorchFREEDOM(torch.nn.Module):
    """Reference-architecture FREEDOM (FREEDOM.py:85-260 semantics): frozen
    mm_image_weight-blended kNN item graph, degree-sensitive edge pruning
    each epoch, LightGCN u-i view + mm item view, mean BPR + reg-weighted
    modality BPR terms through default-init trs Linears."""

    def __init__(self, ds, seed=0, d=D, n_ui=2, n_mm=1, w_img=0.5,
                 dropout=0.8, reg=1e-4):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.n_ui, self.n_mm = ds, n_ui, n_mm
        self.dropout, self.reg = dropout, reg
        self.ue = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(ds.num_users, d)))
        self.ie = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(ds.num_items, d)))
        v = torch.from_numpy(ds.img_features.astype(np.float32))
        t = torch.from_numpy(ds.txt_features.astype(np.float32))
        self.v_feat = torch.nn.Parameter(v.clone())
        self.t_feat = torch.nn.Parameter(t.clone())
        self.image_trs = torch.nn.Linear(v.shape[1], d)
        self.text_trs = torch.nn.Linear(t.shape[1], d)
        # frozen blended kNN graph from the RAW features (detached)
        self.mm_adj = (w_img * _knn_sym_lap(v, K)
                       + (1.0 - w_img) * _knn_sym_lap(t, K))
        self.full_adj = _sym_norm_dense(ds)
        self.masked_adj = self.full_adj
        pairs = ds.train_data.to_user_item_pairs()
        self.rows = torch.from_numpy(pairs[:, 0].astype(np.int64))
        self.cols = torch.from_numpy(pairs[:, 1].astype(np.int64))
        self.edge_values = self._norm_values(self.rows, self.cols)

    def _norm_values(self, rows, cols):
        nu, ni = self.ds.num_users, self.ds.num_items
        rdeg = torch.zeros(nu).index_add_(0, rows, torch.ones(len(rows)))
        cdeg = torch.zeros(ni).index_add_(0, cols, torch.ones(len(cols)))
        return (rdeg + 1e-7)[rows] ** -0.5 * (cdeg + 1e-7)[cols] ** -0.5

    def pre_epoch(self):
        keep_len = int(len(self.rows) * (1.0 - self.dropout))
        keep = torch.multinomial(self.edge_values, keep_len)
        rows, cols = self.rows[keep], self.cols[keep]
        vals = self._norm_values(rows, cols)
        nu = self.ds.num_users
        n = nu + self.ds.num_items
        A = torch.zeros((n, n))
        A[rows, cols + nu] = vals
        A[cols + nu, rows] = vals
        self.masked_adj = A

    def fwd(self, adj):
        h = self.ie
        for _ in range(self.n_mm):
            h = self.mm_adj @ h
        ego = torch.cat([self.ue, self.ie], 0)
        layers = [ego]
        for _ in range(self.n_ui):
            ego = adj @ ego
            layers.append(ego)
        out = torch.stack(layers, 1).mean(1)
        nu = self.ds.num_users
        return out[:nu], out[nu:] + h

    def fit_and_best(self, evaluator, epochs=15, lr=0.01):
        opt = torch.optim.Adam(self.parameters(), lr=lr)
        it = PairwiseIterator(self.ds.train_data, batch_size=256, shuffle=True)
        best = None
        for _ in range(epochs):
            self.pre_epoch()
            for users, pos, neg in it:
                u = torch.from_numpy(users).long()
                i = torch.from_numpy(pos).long()
                j = torch.from_numpy(np.asarray(neg)).long()
                ua, ia = self.fwd(self.masked_adj)

                def bpr(uu, pp, nn):
                    return -torch.nn.functional.logsigmoid(
                        (uu * pp).sum(-1) - (uu * nn).sum(-1)).mean()

                loss = bpr(ua[u], ia[i], ia[j])
                tf = self.text_trs(self.t_feat)
                vf = self.image_trs(self.v_feat)
                loss = loss + self.reg * (bpr(ua[u], tf[i], tf[j])
                                          + bpr(ua[u], vf[i], vf[j]))
                opt.zero_grad(); loss.backward(); opt.step()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            ua, ia = self.fwd(self.full_adj)
        return (ua[torch.from_numpy(np.asarray(users)).long()] @ ia.T).numpy()


def test_freedom_quality_parity(mm_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = mm_dataset
    torch_best = _TorchFREEDOM(ds).fit_and_best(_evaluator(ds))

    from skrx.models.FREEDOM import FREEDOM
    result = FREEDOM(_run(path, "FREEDOM"),
                     dict(lr=0.01, reg=1e-4, embed_dim=D, feat_dim=D,
                          n_mm_layers=1, n_ui_layers=2, knn_k=K,
                          mm_image_weight=0.5, dropout=0.8, batch_size=256,
                          epochs=15, early_stop=15)).fit()
    assert_parity("freedom", result, torch_best)


# --------------------------------------------------------------------------
# LATTICE
# --------------------------------------------------------------------------
class _TorchLATTICE(torch.nn.Module):
    """Reference-architecture LATTICE (LATTICE.py:88-354 semantics,
    cf_model='lightgcn'): learned kNN graph from trs features re-built on
    each epoch's first batch (gradients flow), blended with the frozen raw-
    feature graph by softmaxed modal weights and lambda_coeff; D^-1(A+I)
    u-i propagation; BPR + reg/batch; LambdaLR 0.96^(epoch/50)."""

    def __init__(self, ds, seed=0, d=D, n_layers=1, n_ui=2, lam=0.5,
                 reg=0.0):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.n_layers, self.n_ui = ds, n_layers, n_ui
        self.lam, self.reg = lam, reg
        self.ue = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(ds.num_users, d)))
        self.ie = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(ds.num_items, d)))
        v = torch.from_numpy(ds.img_features.astype(np.float32))
        t = torch.from_numpy(ds.txt_features.astype(np.float32))
        self.v_emb = torch.nn.Parameter(v.clone())
        self.t_emb = torch.nn.Parameter(t.clone())
        self.image_trs = torch.nn.Linear(v.shape[1], d)
        self.text_trs = torch.nn.Linear(t.shape[1], d)
        self.modal_weight = torch.nn.Parameter(torch.tensor([0.5, 0.5]))
        self.img_orig = self._knn_weighted(v)
        self.txt_orig = self._knn_weighted(t)
        # D^-1 (A + I) single-sided normalization (LATTICE.py:172-195)
        nu, ni = ds.num_users, ds.num_items
        n = nu + ni
        A = np.zeros((n, n), dtype=np.float32)
        pairs = ds.train_data.to_user_item_pairs()
        A[pairs[:, 0], pairs[:, 1] + nu] = 1.0
        A[pairs[:, 1] + nu, pairs[:, 0]] = 1.0
        A = A + np.eye(n, dtype=np.float32)
        dinv = 1.0 / A.sum(1)
        self.adj = torch.from_numpy(A * dinv[:, None])
        self.item_adj = None

    @staticmethod
    def _knn_weighted(feats):
        x = feats / feats.norm(dim=-1, keepdim=True)
        sim = x @ x.T
        val, ind = torch.topk(sim, K, dim=-1)
        adj = torch.zeros_like(sim).scatter_(-1, ind, val)
        rowsum = adj.sum(-1)
        dinv = rowsum.pow(-0.5)
        dinv[torch.isinf(dinv)] = 0.0
        return adj * dinv[:, None] * dinv[None, :]

    def fwd(self, build_graph):
        if build_graph:
            w = torch.softmax(self.modal_weight, 0)
            img_adj = self._knn_weighted(self.image_trs(self.v_emb))
            txt_adj = self._knn_weighted(self.text_trs(self.t_emb))
            learned = w[0] * img_adj + w[1] * txt_adj
            rowsum = learned.sum(-1)
            dinv = rowsum.pow(-0.5)
            dinv[torch.isinf(dinv)] = 0.0
            learned = learned * dinv[:, None] * dinv[None, :]
            original = w[0] * self.img_orig + w[1] * self.txt_orig
            self.item_adj = (1 - self.lam) * learned + self.lam * original
        else:
            self.item_adj = self.item_adj.detach()
        h = self.ie
        for _ in range(self.n_layers):
            h = self.item_adj @ h
        ego = torch.cat([self.ue, self.ie], 0)
        layers = [ego]
        for _ in range(self.n_ui):
            ego = self.adj @ ego
            layers.append(ego)
        out = torch.stack(layers, 1).mean(1)
        nu = self.ds.num_users
        return out[:nu], out[nu:] + torch.nn.functional.normalize(h, dim=1)

    def fit_and_best(self, evaluator, epochs=15, lr=0.01):
        opt = torch.optim.Adam(self.parameters(), lr=lr)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda e: 0.96 ** (e / 50))
        it = PairwiseIterator(self.ds.train_data, batch_size=256, shuffle=True)
        best = None
        for _ in range(epochs):
            build = True
            for users, pos, neg in it:
                u = torch.from_numpy(users).long()
                i = torch.from_numpy(pos).long()
                j = torch.from_numpy(np.asarray(neg)).long()
                ua, ia = self.fwd(build)
                build = False
                uu, pp, nn = ua[u], ia[i], ia[j]
                mf = -torch.nn.functional.logsigmoid(
                    (uu * pp).sum(-1) - (uu * nn).sum(-1)).mean()
                regz = 0.5 * (uu.pow(2).sum() + pp.pow(2).sum()
                              + nn.pow(2).sum()) / uu.shape[0]
                loss = mf + self.reg * regz
                opt.zero_grad(); loss.backward(); opt.step()
            sched.step()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            ua, ia = self.fwd(True)
        return (ua[torch.from_numpy(np.asarray(users)).long()] @ ia.T).numpy()


def test_lattice_quality_parity(mm_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = mm_dataset
    torch_best = _TorchLATTICE(ds, seed=seed_offset()).fit_and_best(_evaluator(ds))

    from skrx.models.LATTICE import LATTICE
    result = LATTICE(_run(path, "LATTICE"),
                     dict(lr=0.01, reg=0.0, embed_dim=D, feat_embed_dim=D,
                          lambda_coeff=0.5, n_layers=1, knn_k=K,
                          cf_model="lightgcn", batch_size=256, epochs=15,
                          early_stop=15)).fit()
    # 3-seed spread (committed, BASELINE.md r4): NDCG {0.87, 0.87, 1.07}
    # / Recall {0.88, 0.94, 1.08} — bar = mean - 1 sigma
    assert_parity("lattice", result, torch_best, lower=0.8)


# --------------------------------------------------------------------------
# SLMRec
# --------------------------------------------------------------------------
class _TorchSLMRec(torch.nn.Module):
    """Reference-architecture SLMRec (SLMRec.py:72-583 semantics, FAC task,
    img+txt modalities): shared user table propagated with per-modality item
    towers (id / v_dense / t_dense) over the 'pre'-normalized graph, concat
    fusion + after_GCN Linears, in-batch InfoNCE main loss + FAC
    hierarchical projection InfoNCE, Adam."""

    def __init__(self, ds, seed=0, d=D, layers=2, temp=0.2, ssl_temp=0.1,
                 ssl_alpha=0.01):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.layers = ds, layers
        self.temp, self.ssl_temp, self.alpha = temp, ssl_temp, ssl_alpha
        self.ue = torch.nn.Parameter(torch.nn.init.xavier_uniform_(
            torch.empty(ds.num_users, d), gain=1))
        self.ie = torch.nn.Parameter(torch.nn.init.xavier_uniform_(
            torch.empty(ds.num_items, d), gain=1))
        v = torch.nn.functional.normalize(
            torch.from_numpy(ds.img_features.astype(np.float32)), dim=1)
        t = torch.nn.functional.normalize(
            torch.from_numpy(ds.txt_features.astype(np.float32)), dim=1)
        self.v_feat, self.t_feat = v, t
        self.v_dense = torch.nn.Linear(v.shape[1], d)
        self.t_dense = torch.nn.Linear(t.shape[1], d)
        torch.nn.init.xavier_uniform_(self.v_dense.weight)
        torch.nn.init.xavier_uniform_(self.t_dense.weight)
        self.after_u = torch.nn.Linear(3 * d, d)
        self.after_i = torch.nn.Linear(3 * d, d)
        torch.nn.init.xavier_uniform_(self.after_u.weight)
        torch.nn.init.xavier_uniform_(self.after_i.weight)
        self.g_i_iv = torch.nn.Linear(d, d)
        self.g_v_iv = torch.nn.Linear(d, d)
        self.g_iv_iva = torch.nn.Linear(d, d)
        self.g_iva_ivat = torch.nn.Linear(d, d // 2)
        self.g_t_ivat = torch.nn.Linear(d, d // 2)
        for lin in (self.g_i_iv, self.g_v_iv, self.g_iv_iva,
                    self.g_iva_ivat, self.g_t_ivat):
            torch.nn.init.xavier_uniform_(lin.weight)
        # 'pre' adjacency: D^-0.5 (A) D^-0.5 with 1e-8 epsilon, no self loop
        nu, ni = ds.num_users, ds.num_items
        n = nu + ni
        A = np.zeros((n, n), dtype=np.float32)
        pairs = ds.train_data.to_user_item_pairs()
        A[pairs[:, 0], pairs[:, 1] + nu] = 1.0
        A[pairs[:, 1] + nu, pairs[:, 0]] = 1.0
        dinv = (A.sum(1) + 1e-8) ** -0.5
        self.adj = torch.from_numpy(A * dinv[:, None] * dinv[None, :])
        self.all_users = self.all_items = None

    def _graph(self, i_emb):
        h = torch.cat([self.ue, i_emb], 0)
        embs = [h]
        for _ in range(self.layers):
            h = self.adj @ h
            embs.append(h)
        return torch.stack(embs, 1).mean(1)

    def compute(self):
        nu = self.ds.num_users
        i_out = self._graph(self.ie)
        v_out = self._graph(self.v_dense(self.v_feat))
        t_out = self._graph(self.t_dense(self.t_feat))
        self.i_emb_i = i_out[nu:]
        self.v_emb_i = v_out[nu:]
        self.t_emb_i = t_out[nu:]
        user = self.after_u(torch.cat([i_out[:nu], v_out[:nu], t_out[:nu]], 1))
        item = self.after_i(torch.cat([i_out[nu:], v_out[nu:], t_out[nu:]], 1))
        return user, item

    def _infonce(self, a, b, temp):
        logits = a @ b.T / temp
        labels = torch.arange(a.shape[0])
        return torch.nn.functional.cross_entropy(logits, labels)

    def step_loss(self, users, pos):
        self.all_users, self.all_items = self.compute()
        ue = torch.nn.functional.normalize(self.all_users[users], dim=1)
        pe = torch.nn.functional.normalize(self.all_items[pos], dim=1)
        main = self._infonce(ue, pe, self.temp)
        # FAC
        x_i = self.g_i_iv(self.i_emb_i[pos])
        x_v = self.g_v_iv(self.v_emb_i[pos])
        v_loss = self._infonce(x_i, x_v, self.ssl_temp)
        x_iva = self.g_iva_ivat(self.g_iv_iva(x_i))
        x_t = self.g_t_ivat(self.t_emb_i[pos])
        t_loss = self._infonce(x_iva, x_t, self.ssl_temp)
        return main + self.alpha * (v_loss + t_loss)

    def fit_and_best(self, evaluator, epochs=15, lr=0.01):
        opt = torch.optim.Adam(self.parameters(), lr=lr)
        it = InteractionIterator(self.ds.train_data, batch_size=256,
                                 shuffle=True)
        best = None
        for _ in range(epochs):
            for users, pos in it:
                u = torch.from_numpy(users).long()
                i = torch.from_numpy(pos).long()
                loss = self.step_loss(u, i)
                opt.zero_grad(); loss.backward(); opt.step()
            with torch.no_grad():
                self.all_users, self.all_items = self.compute()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        u = torch.from_numpy(np.asarray(users)).long()
        scores = self.all_users[u] @ self.all_items.T
        return torch.sigmoid(scores).detach().numpy()


def test_slmrec_quality_parity(mm_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = mm_dataset
    torch_best = _TorchSLMRec(ds, seed=seed_offset()).fit_and_best(_evaluator(ds))

    from skrx.models.SLMRec import SLMRec
    result = SLMRec(_run(path, "SLMRec"),
                    dict(lr=0.01, rec_dim=D, layer_num=2, ssl_alpha=0.01,
                         ssl_temp=0.1, temp=0.2, mm_fusion_mode="concat",
                         adj_type="pre", ssl_task="FAC", batch_size=256,
                         epochs=15, early_stop=15)).fit()
    # DECISIVELY settled round 5 (scripts/parity_decisive.py, 320-user
    # fixture, 18 seeds): NDCG ratio mean 0.993, CI95 [0.956, 1.030]
    # (BASELINE.md r5). The in-batch-InfoNCE noise on THIS 100-user
    # fixture keeps the small-fixture band at 0.75.
    assert_parity("slmrec", result, torch_best, lower=0.75)


# --------------------------------------------------------------------------
# MGCN
# --------------------------------------------------------------------------
class _TorchMGCN(torch.nn.Module):
    """Reference-architecture MGCN (MGCN.py:117-361 semantics): purifier
    gates modality features by item-id embeddings, u-i LightGCN view +
    weighted-kNN modality item views lifted to users via normalized R,
    attention fusion of common/separate parts, BPR + reg/batch + 0.2-temp
    InfoNCE(side, content) both for items and users."""

    def __init__(self, ds, seed=0, d=D, n_ui=2, n_mm=1, cl_w=0.001,
                 reg=1e-4):
        super().__init__()
        torch.manual_seed(seed)
        self.ds, self.n_ui, self.n_mm = ds, n_ui, n_mm
        self.cl_w, self.reg = cl_w, reg
        nu, ni = ds.num_users, ds.num_items
        self.ue = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(nu, d)))
        self.ie = torch.nn.Parameter(
            torch.nn.init.xavier_uniform_(torch.empty(ni, d)))
        v = torch.from_numpy(ds.img_features.astype(np.float32))
        t = torch.from_numpy(ds.txt_features.astype(np.float32))
        self.v_emb = torch.nn.Parameter(v.clone())
        self.t_emb = torch.nn.Parameter(t.clone())
        self.image_trs = torch.nn.Linear(v.shape[1], d)
        self.text_trs = torch.nn.Linear(t.shape[1], d)
        self.img_adj = _knn_sym_lap(v, K, weighted=True)
        self.txt_adj = _knn_sym_lap(t, K, weighted=True)
        self.query_common = torch.nn.Sequential(
            torch.nn.Linear(d, d), torch.nn.Tanh(),
            torch.nn.Linear(d, 1, bias=False))
        self.gate_v = torch.nn.Sequential(torch.nn.Linear(d, d),
                                          torch.nn.Sigmoid())
        self.gate_t = torch.nn.Sequential(torch.nn.Linear(d, d),
                                          torch.nn.Sigmoid())
        self.gate_ip = torch.nn.Sequential(torch.nn.Linear(d, d),
                                           torch.nn.Sigmoid())
        self.gate_tp = torch.nn.Sequential(torch.nn.Linear(d, d),
                                           torch.nn.Sigmoid())
        # sym-normalized bipartite without self loops; R = its u-i block
        A = np.zeros((nu + ni, nu + ni), dtype=np.float32)
        pairs = ds.train_data.to_user_item_pairs()
        A[pairs[:, 0], pairs[:, 1] + nu] = 1.0
        A[pairs[:, 1] + nu, pairs[:, 0]] = 1.0
        dinv = np.power(A.sum(1), -0.5)
        dinv[np.isinf(dinv)] = 0.0
        An = A * dinv[:, None] * dinv[None, :]
        self.adj = torch.from_numpy(An)
        self.R = torch.from_numpy(An[:nu, nu:])

    def fwd(self, train=False):
        nu = self.ds.num_users
        image_feats = self.image_trs(self.v_emb)
        text_feats = self.text_trs(self.t_emb)
        img_item = self.ie * self.gate_v(image_feats)
        txt_item = self.ie * self.gate_t(text_feats)

        ego = torch.cat([self.ue, self.ie], 0)
        layers = [ego]
        for _ in range(self.n_ui):
            ego = self.adj @ ego
            layers.append(ego)
        content = torch.stack(layers, 1).mean(1)

        for _ in range(self.n_mm):
            img_item = self.img_adj @ img_item
        img_user = self.R @ img_item
        image_embeds = torch.cat([img_user, img_item], 0)
        for _ in range(self.n_mm):
            txt_item = self.txt_adj @ txt_item
        txt_user = self.R @ txt_item
        text_embeds = torch.cat([txt_user, txt_item], 0)

        att = torch.cat([self.query_common(image_embeds),
                         self.query_common(text_embeds)], -1)
        w = torch.softmax(att, -1)
        common = w[:, 0:1] * image_embeds + w[:, 1:2] * text_embeds
        sep_img = (image_embeds - common) * self.gate_ip(content)
        sep_txt = (text_embeds - common) * self.gate_tp(content)
        side = (sep_img + sep_txt + common) / 3
        out = content + side
        if train:
            return out[:nu], out[nu:], side, content
        return out[:nu], out[nu:]

    @staticmethod
    def _infonce(a, b, temp=0.2):
        a = torch.nn.functional.normalize(a, dim=1)
        b = torch.nn.functional.normalize(b, dim=1)
        pos = torch.exp((a * b).sum(-1) / temp)
        ttl = torch.exp(a @ b.T / temp).sum(1)
        return -torch.log(pos / ttl).mean()

    def fit_and_best(self, evaluator, epochs=15, lr=0.01):
        opt = torch.optim.Adam(self.parameters(), lr=lr)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda e: 0.96 ** (e / 50))
        it = PairwiseIterator(self.ds.train_data, batch_size=256, shuffle=True)
        nu = self.ds.num_users
        best = None
        for _ in range(epochs):
            for users, pos, neg in it:
                u = torch.from_numpy(users).long()
                i = torch.from_numpy(pos).long()
                j = torch.from_numpy(np.asarray(neg)).long()
                ua, ia, side, content = self.fwd(train=True)
                uu, pp, nn = ua[u], ia[i], ia[j]
                mf = -torch.nn.functional.logsigmoid(
                    (uu * pp).sum(-1) - (uu * nn).sum(-1)).mean()
                regz = 0.5 * (uu.pow(2).sum() + pp.pow(2).sum()
                              + nn.pow(2).sum()) / uu.shape[0]
                cl = self._infonce(side[nu:][i], content[nu:][i]) \
                    + self._infonce(side[:nu][u], content[:nu][u])
                loss = mf + self.reg * regz + self.cl_w * cl
                opt.zero_grad(); loss.backward(); opt.step()
            sched.step()
            best = track_best(best, evaluator, self)
        return best

    def predict(self, users):
        with torch.no_grad():
            ua, ia = self.fwd()
        return (ua[torch.from_numpy(np.asarray(users)).long()] @ ia.T).numpy()


def test_mgcn_quality_parity(mm_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path, ds = mm_dataset
    torch_best = _TorchMGCN(ds, seed=seed_offset()).fit_and_best(_evaluator(ds))

    from skrx.models.MGCN import MGCN

    result = MGCN(_run(path, "MGCN"),
                  dict(lr=0.01, reg=1e-4, embed_dim=D, n_ui_layers=2,
                       n_layers=1, knn_k=K, cl_loss=0.001, batch_size=256,
                       epochs=15, early_stop=15)).fit()
    # DECISIVELY settled round 5 (scripts/parity_decisive.py, 320-user
    # fixture, 6 seeds): NDCG ratio mean 1.020, CI95 [0.983, 1.057] — the
    # old 0.90 3-seed mean was small-fixture noise (BASELINE.md r5). The
    # small-fixture band stays noise-calibrated for CI speed.
    assert_parity("mgcn", result, torch_best, lower=0.85)
