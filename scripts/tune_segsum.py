"""Sweep segsum_mxu (block_k, window) across graph sizes/dims on the real
TPU; the winners populate skrx/ops/pallas/autotune.py's measured table.

Usage: python scripts/tune_segsum.py [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from skrx.models.LightGCN import build_bipartite_adj
    from skrx.ops.pallas.segsum_mxu import (mxu_graph_from_sp_matrix,
                                            propagate_mxu)

    configs = [(200_000, 32), (200_000, 64), (1_000_000, 64),
               (4_000_000, 64), (4_000_000, 128), (8_000_000, 64)]
    if args.quick:
        configs = [(200_000, 64)]
    candidates = [(256, 128), (512, 128), (1024, 128), (2048, 128),
                  (512, 256), (1024, 256), (512, 512), (1024, 512)]

    for inter, dim in configs:
        rs = np.random.RandomState(0)
        # node count scales with edges like Gowalla density (~57 edges/node)
        n_nodes = max(int(inter / 28), 2000)
        users = n_nodes * 3 // 7
        items = n_nodes - users
        pairs = np.stack([rs.randint(0, users, inter),
                          rs.randint(0, items, inter)], 1).astype(np.int64)
        adj = build_bipartite_adj(pairs, users, items, "pre")
        x = jnp.asarray(rs.rand(users + items, dim).astype(np.float32))
        rows = []
        for bk, win in candidates:
            try:
                g = mxu_graph_from_sp_matrix(adj, block_k=bk, window=win)
                f = jax.jit(lambda xx, g=g: propagate_mxu(g, xx))
                out = f(x); float(jnp.sum(out[:4]))
                n = 5 if args.quick else 15
                t0 = time.perf_counter()
                for _ in range(n):
                    out = f(x)
                float(jnp.sum(out[:4]))
                dt = (time.perf_counter() - t0) / n * 1e3
                rows.append((bk, win, dt))
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                rows.append((bk, win, float("nan")))
                print(f"  ({bk},{win}): FAILED {type(e).__name__}: {e}")
        best = min((r for r in rows if r[2] == r[2]), key=lambda r: r[2])
        print(f"edges={adj.nnz} dim={dim}  "
              + "  ".join(f"({bk},{w})={dt:.2f}ms" for bk, w, dt in rows)
              + f"  BEST=({best[0]},{best[1]})")


if __name__ == "__main__":
    main()
