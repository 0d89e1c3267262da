"""Decisive multi-seed quality-parity experiment for the grey-zone models
(MGCN, Caser, SLMRec) — VERDICT r4 #4.

The committed 3-seed spreads (BASELINE.md) carry sigma ~0.15 per draw at
100-120 users, which cannot separate "real 10% gap" from noise. This script
scales the fixture (3-4x users/interactions => ~sqrt(3)x smaller per-draw
sigma, since the variance is dominated by the finite test-user count) and
runs N independent (torch-loop, skrx) seed pairs, reporting the mean ratio
with a 95% t-CI. Decision rule (the verdict's): parity holds if the CI
excludes the historical 0.90 point from below (i.e. mean ratio >= ~0.95
with the CI excluding the gap) — otherwise the divergence is real and must
be hunted in code.

Run off-suite (not part of the test suite — ~minutes per model):

    python scripts/parity_decisive.py --models mgcn caser slmrec --seeds 6

Appends one JSON line per (model, seed) to scripts/parity_decisive.jsonl
and prints the summary table committed to BASELINE.md round 5.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def _seed_everything(offset):
    import torch
    from skrx.utils.random import set_host_seed
    np.random.seed(20260819 + offset)
    set_host_seed(20260819 + offset)
    torch.manual_seed(offset)


def _make_mm_dataset(root, users, items, ratings):
    from skrx.io import RSDataset, synthetic
    path = synthetic.make_dataset_dir(root, num_users=users, num_items=items,
                                      num_ratings=ratings, seed=17,
                                      latent_dim=4, latent_strength=8.0,
                                      with_mm=True, img_dim=12, txt_dim=10)
    return path, RSDataset(path, "\t", "UIRT")


def _make_cf_dataset(root, users, items, ratings):
    from skrx.io import RSDataset, synthetic
    path = synthetic.make_dataset_dir(root, num_users=users, num_items=items,
                                      num_ratings=ratings, seed=13,
                                      latent_dim=4, latent_strength=8.0)
    return path, RSDataset(path, "\t", "UIRT")


def _evaluator(ds):
    from skrx.eval import RankingEvaluator
    return RankingEvaluator(ds.train_data.to_user_dict(),
                            ds.test_data.to_user_dict(),
                            metric=("NDCG", "Recall"), top_k=(10,),
                            batch_size=64)


def _run_config(path, name, seed):
    from skrx import RunConfig
    return RunConfig(recommender=name, data_dir=path, file_column="UIRT",
                     sep="\t", metric=("NDCG", "Recall"), top_k=(10,),
                     test_batch_size=64, seed=2021 + seed)


def run_mgcn(path, ds, seed, epochs):
    from tests.test_quality_parity_mm import _TorchMGCN, D, K
    from skrx.models.MGCN import MGCN
    ref = _TorchMGCN(ds, seed=seed).fit_and_best(_evaluator(ds),
                                                 epochs=epochs)
    skrx = MGCN(_run_config(path, "MGCN", seed),
                dict(lr=0.01, reg=1e-4, embed_dim=D, n_ui_layers=2,
                     n_layers=1, knn_k=K, cl_loss=0.001, batch_size=256,
                     epochs=epochs, early_stop=epochs)).fit()
    return ref, dict(skrx.items())


def run_slmrec(path, ds, seed, epochs):
    from tests.test_quality_parity_mm import _TorchSLMRec, D
    from skrx.models.SLMRec import SLMRec
    ref = _TorchSLMRec(ds, seed=seed).fit_and_best(_evaluator(ds),
                                                   epochs=epochs)
    skrx = SLMRec(_run_config(path, "SLMRec", seed),
                  dict(lr=0.01, rec_dim=D, layer_num=2, ssl_alpha=0.01,
                       ssl_temp=0.1, temp=0.2, mm_fusion_mode="concat",
                       adj_type="pre", ssl_task="FAC", batch_size=256,
                       epochs=epochs, early_stop=epochs)).fit()
    return ref, dict(skrx.items())


def run_caser(path, ds, seed, epochs):
    from tests.test_quality_parity_zoo import _TorchCaserRunner, D
    from skrx.models.Caser import Caser
    ref = _TorchCaserRunner(ds, seed=seed).fit_and_best(_evaluator(ds),
                                                        epochs=epochs)
    skrx = Caser(_run_config(path, "Caser", seed),
                 dict(lr=0.01, l2_reg=1e-6, embed_size=D, seq_L=5, seq_T=3,
                      nv=2, nh=4, dropout=0.5, batch_size=256, epochs=epochs,
                      early_stop=epochs)).fit()
    return ref, dict(skrx.items())


RUNNERS = {"mgcn": (run_mgcn, "mm", 15), "slmrec": (run_slmrec, "mm", 15),
           "caser": (run_caser, "cf", 12)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["mgcn", "caser",
                                                    "slmrec"])
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed (extend an earlier run's JSONL)")
    ap.add_argument("--users", type=int, default=320)
    ap.add_argument("--items", type=int, default=420)
    ap.add_argument("--ratings", type=int, default=13000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "parity_decisive.jsonl"))
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="skrx_parity_")
    os.chdir(work)
    mm = cf = None
    summary = {}
    for name in args.models:
        runner, kind, epochs = RUNNERS[name]
        if kind == "mm":
            if mm is None:
                mm = _make_mm_dataset(work, args.users, args.items,
                                      args.ratings)
            path, ds = mm
        else:
            if cf is None:
                cf = _make_cf_dataset(os.path.join(work, "cf"), args.users,
                                      args.items, args.ratings)
            path, ds = cf
        rows = []
        for seed in range(args.seed_start, args.seed_start + args.seeds):
            _seed_everything(seed)
            t0 = time.time()
            ref, skrx = runner(path, ds, seed, epochs)
            row = {"model": name, "seed": seed,
                   "users": args.users, "ratings": args.ratings,
                   "ref_ndcg": ref["NDCG@10"], "skrx_ndcg": skrx["NDCG@10"],
                   "ref_recall": ref["Recall@10"],
                   "skrx_recall": skrx["Recall@10"],
                   "ndcg_ratio": skrx["NDCG@10"] / ref["NDCG@10"],
                   "recall_ratio": skrx["Recall@10"] / ref["Recall@10"],
                   "secs": round(time.time() - t0, 1)}
            rows.append(row)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[{name} seed {seed}] ndcg_ratio="
                  f"{row['ndcg_ratio']:.3f} recall_ratio="
                  f"{row['recall_ratio']:.3f} ({row['secs']}s)", flush=True)
        r = np.array([x["ndcg_ratio"] for x in rows])
        rr = np.array([x["recall_ratio"] for x in rows])
        n = len(r)
        # 95% t-CI (two-sided); t_{n-1,0.975} via lookup for small n
        tcrit = {2: 12.7, 3: 4.30, 4: 3.18, 5: 2.78, 6: 2.57, 7: 2.45,
                 8: 2.36, 9: 2.31, 10: 2.26}.get(n, 2.0)
        half = tcrit * r.std(ddof=1) / np.sqrt(n)
        summary[name] = (r.mean(), r.std(ddof=1), r.mean() - half,
                         r.mean() + half, rr.mean())
        print(f"== {name}: ndcg ratio mean {r.mean():.3f} sd "
              f"{r.std(ddof=1):.3f} CI95 [{r.mean()-half:.3f}, "
              f"{r.mean()+half:.3f}] recall mean {rr.mean():.3f}",
              flush=True)

    print("\n| model | n | NDCG ratio mean | sd | 95% CI | Recall mean |")
    print("|---|---|---|---|---|---|")
    for name, (m, sd, lo, hi, rm) in summary.items():
        print(f"| {name} | {args.seeds} | {m:.3f} | {sd:.3f} "
              f"| [{lo:.3f}, {hi:.3f}] | {rm:.3f} |")


if __name__ == "__main__":
    main()
