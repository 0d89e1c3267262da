"""Reproduce the sparse-propagation measurements quoted in
skrx/ops/pallas/segsum_mxu.py and docs/design.md, on the real TPU.

Gowalla-scale synthetic bipartite graph (30k users x 40k items, 2M
interactions -> 4M directed edges, D=64):

  1. single propagate: XLA sorted segment-sum vs the MXU kernel (f32/bf16)
  2. full LightGCN 3-layer train step (fwd+bwd+Adam) across the three impls

Usage: python scripts/bench_propagate.py [--edges 4000000] [--dim 64]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interactions", type=int, default=2_000_000)
    ap.add_argument("--users", type=int, default=30_000)
    ap.add_argument("--items", type=int, default=40_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048)
    args, _ = ap.parse_known_args()

    import jax
    import jax.numpy as jnp
    import optax

    from skrx.ops import bpr_loss
    from skrx.ops.graph import graph_from_sp_matrix, propagate
    from skrx.ops.pallas.segsum_mxu import mxu_graph_from_sp_matrix
    from skrx.models.LightGCN import build_bipartite_adj

    rs = np.random.RandomState(0)
    U, I, D, B = args.users, args.items, args.dim, args.batch
    pairs = np.stack([rs.randint(0, U, args.interactions),
                      rs.randint(0, I, args.interactions)], 1).astype(np.int64)
    adj = build_bipartite_adj(pairs, U, I, "pre")
    N = U + I
    print(f"graph: {N} nodes, {adj.nnz} edges, D={D}")

    x = jnp.asarray(rs.rand(N, D).astype(np.float32))
    ss = "--no-src-sort" not in sys.argv
    graphs = [("segment", graph_from_sp_matrix(adj)),
              ("mxu", mxu_graph_from_sp_matrix(adj, src_sorted=ss)),
              ("mxu_bf16", mxu_graph_from_sp_matrix(adj,
                                                    msg_dtype=jnp.bfloat16,
                                                    src_sorted=ss))]
    print(f"src_sorted={ss}")

    def timeit(fn, *a, n=10):
        out = fn(*a)
        float(jnp.sum(out[:8]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(jnp.sum(out[:8]))
        return (time.perf_counter() - t0) / n * 1000

    print("-- single propagate (A @ x) --")
    base = None
    for tag, g in graphs:
        f = jax.jit(lambda xx, g=g: propagate(g, xx))
        dt = timeit(f, x)
        base = base or dt
        print(f"{tag:9s}: {dt:8.2f} ms  ({base / dt:.1f}x)")

    print("-- LightGCN 3-layer train step (fwd+bwd+Adam) --")
    params = {"user_emb": jnp.asarray(rs.randn(U, D).astype(np.float32) * .01),
              "item_emb": jnp.asarray(rs.randn(I, D).astype(np.float32) * .01)}
    opt = optax.adam(1e-3)
    users = jnp.asarray(rs.randint(0, U, B).astype(np.int32))
    pos = jnp.asarray(rs.randint(0, I, B).astype(np.int32))
    neg = jnp.asarray(rs.randint(0, I, B).astype(np.int32))

    def make_step(g):
        def loss_fn(p):
            ego = jnp.concatenate([p["user_emb"], p["item_emb"]], 0)
            layers, h = [ego], ego
            for _ in range(3):
                h = propagate(g, h)
                layers.append(h)
            comb = jnp.mean(jnp.stack(layers, 1), 1)
            u_all, i_all = comb[:U], comb[U:]
            return jnp.mean(bpr_loss(jnp.sum(u_all[users] * i_all[pos], -1),
                                     jnp.sum(u_all[users] * i_all[neg], -1)))

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, s = opt.update(grads, s, p)
            return optax.apply_updates(p, upd), s, loss

        return step

    base = None
    for tag, g in graphs:
        step = make_step(g)
        p, s, loss = step(params, opt.init(params))
        float(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            p, s, loss = step(p, s)
        float(loss)
        dt = (time.perf_counter() - t0) / 10 * 1000
        base = base or dt
        print(f"{tag:9s}: {dt:8.1f} ms/step ({base / dt:.1f}x)  "
              f"loss={float(loss):.5f}")


if __name__ == "__main__":
    main()
