"""TPU smoke sweep: instantiate and train every zoo model for 2 epochs on a
small synthetic dataset ON THE REAL TPU (tests run on CPU; this catches
TPU-lowering differences). Prints one line per model."""
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skrx import RunConfig
from skrx.io import synthetic
from skrx.utils import ModelRegistry

ZOO = {
    "Pop": {},
    "BPRMF": dict(lr=0.01, n_dim=16, batch_size=256),
    "BPRMF_lazy": dict(lr=0.01, n_dim=16, batch_size=256,
                       optimizer="lazy_adam"),
    "AOBPR": dict(lr=0.05, reg=0.01, embed_size=16, alpha=100, batch_size=256),
    "FPMC": dict(lr=0.01, embed_size=16, batch_size=256),
    "TransRec": dict(lr=0.01, embed_size=16, batch_size=256),
    "CML": dict(lr=0.05, reg=1.0, embed_size=16, dns=5, batch_size=128),
    "CDAE": dict(lr=0.01, hidden_dim=16, batch_size=64),
    "MultVAE": dict(lr=0.01, p_dims=[16], batch_size=64),
    "GRU4Rec": dict(lr=0.01, layers=[16], batch_size=16),
    "GRU4RecPlus": dict(lr=0.01, layers=[16], batch_size=16, n_sample=32),
    "SASRec": dict(lr=0.01, hidden_units=16, max_len=10, num_blocks=1,
                   num_heads=2, batch_size=32),
    "BERT4Rec": dict(lr=0.001, max_seq_len=8, h_size=16, att_heads=2,
                     n_layers=1, batch_size=64),
    "Caser": dict(lr=0.01, embed_size=16, seq_L=4, seq_T=2, nv=2, nh=4,
                  batch_size=256),
    "HGN": dict(lr=0.01, seq_L=4, seq_T=2, embed_size=16, batch_size=256),
    "SRGNN": dict(lr=0.01, hidden_size=16, max_seq_len=20, batch_size=64),
    "SGAT": dict(lr=0.01, n_layers=2, n_seqs=4, n_next=2, embed_size=16,
                 batch_size=256),
    "LightGCN": dict(lr=0.01, embed_size=16, n_layers=2, batch_size=256),
    "LayerGCN": dict(lr=0.01, embed_dim=16, n_layers=2, dropout=0.2,
                     batch_size=256),
    "DENS": dict(lr=0.01, dim=16, context_hops=2, K=2, n_negs=3,
                 batch_size=256),
    "LightGCL": dict(lr=0.01, d=16, gnn_layer=2, svd_q=4, batch_size=256),
    "SelfCF": dict(lr=0.01, embed_dim=16, n_layers=2, batch_size=256),
    "LATTICE": dict(lr=0.01, embed_dim=16, feat_embed_dim=16,
                    weight_size=[16, 16], knn_k=5, batch_size=256),
    "SLMRec": dict(lr=0.01, rec_dim=16, layer_num=2, ssl_task="FAC",
                   batch_size=256),
    "BM3": dict(lr=0.01, embed_dim=16, n_layers=1, batch_size=256),
    "FREEDOM": dict(lr=0.01, embed_dim=16, feat_dim=16, knn_k=5,
                    n_ui_layers=2, dropout=0.5, batch_size=256),
    "MGCN": dict(lr=0.01, embed_dim=16, knn_k=5, batch_size=256),
}


def main():
    work = tempfile.mkdtemp(prefix="tpu_smoke_")
    os.chdir(work)
    data_dir = synthetic.make_dataset_dir(work, num_users=60, num_items=100,
                                          num_ratings=1800, seed=5,
                                          with_mm=True, img_dim=12, txt_dim=10)
    registry = ModelRegistry()
    failures = []
    for display, params in ZOO.items():
        name = display.split("_")[0]
        cfg = RunConfig(recommender=name, data_dir=data_dir,
                        file_column="UIRT", sep="\t", metric=("NDCG",),
                        top_k=(10,), test_batch_size=32, seed=2021)
        full = dict(params, epochs=2, early_stop=2)
        t0 = time.perf_counter()
        try:
            assert registry.load_skrx_model(name)
            model_cls, _ = registry.get_model(name)
            model = model_cls(cfg, full)
            result = model.fit()
            ndcg = result["NDCG@10"]
            ok = ndcg == ndcg and ndcg >= 0  # finite
            print(f"{display:16s} {'OK' if ok else 'BAD'} "
                  f"NDCG@10={ndcg:.4f} [{time.perf_counter() - t0:.1f}s]",
                  flush=True)
            if not ok:
                failures.append(display)
        except Exception as e:
            print(f"{display:16s} FAIL {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
            failures.append(display)
    print("FAILURES:", failures if failures else "none", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
