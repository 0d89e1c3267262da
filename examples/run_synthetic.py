"""Minimal end-to-end example: generate data, train two models, compare,
serve recommendations. Run: python examples/run_synthetic.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skrx import RunConfig
from skrx.io import synthetic
from skrx.models.BPRMF import BPRMF
from skrx.models.Pop import Pop
from skrx.serve import TopKRecommender


def main():
    work = tempfile.mkdtemp(prefix="skrx_example_")
    os.chdir(work)
    data_dir = synthetic.make_dataset_dir(work, num_users=300, num_items=500,
                                          num_ratings=10000, seed=42,
                                          latent_dim=6, latent_strength=8.0)

    def run_cfg(name):
        return RunConfig(recommender=name, data_dir=data_dir,
                         file_column="UIRT", sep="\t",
                         metric=("Recall", "NDCG"), top_k=(10, 20),
                         test_batch_size=128, seed=2021)

    pop = Pop(run_cfg("Pop"), {})
    pop_best = pop.fit()

    bprmf = BPRMF(run_cfg("BPRMF"),
                  dict(lr=0.01, reg=0.01, n_dim=32, batch_size=512,
                       epochs=40, early_stop=15))
    mf_best = bprmf.fit()

    print(f"\nPop    NDCG@10 = {pop_best['NDCG@10']:.4f}")
    print(f"BPRMF  NDCG@10 = {mf_best['NDCG@10']:.4f}")

    server = TopKRecommender(bprmf, k=5)
    ids, scores = server.recommend([0, 1, 2])
    for u, row in zip([0, 1, 2], ids):
        print(f"user {u}: top-5 recommendations {row.tolist()}")


if __name__ == "__main__":
    main()
