"""Long-run convergence sweep ON THE REAL TPU: train one model per family
for ~100+ epochs on a mid-size synthetic dataset and record the best
NDCG@10 + steady-state epoch time. Evidence that the whole-epoch device
pipelines stay numerically stable far past the smoke-test horizon
(divergence, NaN leaks, and compile-cache issues all show up here first).

Usage: python scripts/longrun.py [--epochs N] [--quick]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skrx import RunConfig
from skrx.io import synthetic
from skrx.utils import ModelRegistry

# one per family: MF, VAE, session RNN, seq attention, masked LM, seq CNN,
# metric learning, graph CF, graph CL, multimodal SSL
SWEEP = [
    ("BPRMF", dict(lr=0.01, n_dim=32, batch_size=512), 150),
    ("MultVAE", dict(lr=0.005, p_dims=[32], batch_size=128), 100),
    ("GRU4Rec", dict(lr=0.05, layers=[32], batch_size=32), 100),
    ("SASRec", dict(lr=0.01, hidden_units=32, max_len=20, num_blocks=2,
                    num_heads=2, batch_size=128), 100),
    ("BERT4Rec", dict(lr=1e-3, max_seq_len=16, h_size=32, att_heads=2,
                      n_layers=2, batch_size=128, verbose=5), 100),
    ("Caser", dict(lr=0.01, embed_size=32, seq_L=5, seq_T=3, nv=2, nh=8,
                   batch_size=512), 100),
    ("CML", dict(lr=0.05, reg=1.0, embed_size=32, dns=5, batch_size=256), 100),
    ("LightGCN", dict(lr=0.01, embed_size=32, n_layers=3,
                      batch_size=512), 150),
    ("LightGCL", dict(lr=0.01, d=32, gnn_layer=2, svd_q=5,
                      batch_size=512), 100),
    ("BM3", dict(lr=0.01, embed_dim=32, n_layers=2, batch_size=512), 100),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="override every model's epoch budget")
    ap.add_argument("--quick", action="store_true", help="5 epochs each")
    args = ap.parse_args()

    work = tempfile.mkdtemp()
    data = synthetic.make_dataset_dir(work, num_users=500, num_items=800,
                                      num_ratings=20000, seed=3,
                                      latent_dim=6, latent_strength=6.0,
                                      with_mm=True, img_dim=24, txt_dim=16)
    os.chdir(work)
    reg = ModelRegistry()
    print(f"{'model':10s} {'epochs':>6s} {'best NDCG@10':>12s} "
          f"{'s/epoch':>8s} {'total s':>8s}")
    for name, hp, epochs in SWEEP:
        if args.quick:
            epochs = 5
        if args.epochs:
            epochs = args.epochs
        reg.load_skrx_model(name)
        cls, _ = reg.get_model(name)
        run = RunConfig(recommender=name, data_dir=data, file_column="UIRT",
                        sep="\t", metric=("NDCG",), top_k=(10,),
                        test_batch_size=256, seed=2021)
        hp = dict(hp, epochs=epochs, early_stop=epochs)
        t0 = time.time()
        try:
            result = cls(run, hp).fit()
            total = time.time() - t0
            print(f"{name:10s} {epochs:6d} {float(result['NDCG@10']):12.4f} "
                  f"{total / epochs:8.2f} {total:8.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"{name:10s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
