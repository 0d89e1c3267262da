"""Benchmark: LightGCN full train step at Gowalla scale, skrx-on-TPU vs the
reference-architecture torch-CPU loop, plus the evaluator hot loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"eval_users_per_s", "eval_vs_xla"}.

Train workload (BASELINE.md config #3): LightGCN d=64, batch 2048 on a
Gowalla-scale bipartite graph (30k users x 40k items, 2M interactions -> 4M
directed edges). Each train step runs the FULL 3-layer graph propagation
forward + backward + Adam — the chip-bound showcase of the Pallas MXU
scatter kernel (skrx/ops/pallas/segsum_mxu.py; the XLA segment-sum scatter it
replaces runs at ~15 GB/s effective).

Eval workload (second hot loop, reference evaluator.py:163-214): fused
masked top-k + 4 ranking metrics @<=50 over a (1024, 40960) score matrix —
`eval_users_per_s` is the Pallas-kernel evaluator throughput and
`eval_vs_xla` its speedup over the XLA mask+lax.top_k path on the same chip,
so an eval-kernel regression is visible in the driver artifact.

Baseline: the reference implementation cannot be built here (its Cython
extensions need Cython, absent from the image), so the baseline is a faithful
torch-CPU reimplementation of the reference's exact hot loop
(skrec/recommender/LightGCN.py:89-111: torch.sparse.mm K-layer propagation,
mean layer combination, mean BPR + reg*L2/batch, Adam), measured on this
machine's CPU. The skrx number is the jitted train step on the TPU with
graph_impl resolved as in production ('mxu' on TPU at this edge count).

Measurement discipline (VERDICT r2 #1): the CPU baseline takes the BEST of
``BASELINE_REPEATS`` timed repeats — host load can only make a repeat
slower, so best-of-N estimates the unloaded machine and cannot flip the
ratio downward under contention; the TPU numbers take the median of 3
repeats. All device timings force materialization with float(...)/np.asarray
(axon: block_until_ready does not sync through the tunnel).
"""
import json
import os
import sys
import time

import numpy as np

USERS, ITEMS, INTERACTIONS = 30_000, 40_000, 2_000_000
DIM, BATCH, LAYERS, LR, REG = 64, 2048, 3, 1e-3, 1e-3
BASELINE_REPEATS = 5
EVAL_B, EVAL_N, EVAL_K = 1024, 40_960, 50

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _graph_and_batch(seed=0):
    from skrx.models.LightGCN import build_bipartite_adj

    rs = np.random.RandomState(seed)
    pairs = np.stack([rs.randint(0, USERS, INTERACTIONS),
                      rs.randint(0, ITEMS, INTERACTIONS)],
                     1).astype(np.int64)
    adj = build_bipartite_adj(pairs, USERS, ITEMS, "pre")
    users = rs.randint(0, USERS, BATCH).astype(np.int32)
    pos = rs.randint(0, ITEMS, BATCH).astype(np.int32)
    neg = rs.randint(0, ITEMS, BATCH).astype(np.int32)
    return adj, users, pos, neg


def bench_reference_cpu(adj, users, pos, neg, n_steps=5):
    """Reference-architecture LightGCN train step on torch CPU."""
    import torch
    # explicit intra-op thread count: the CPU baseline swings ~2.5x when
    # other processes contend for this 2-core host, so make the
    # configuration at least deterministic
    torch.set_num_threads(os.cpu_count() or 1)

    coo = adj.tocoo()
    a = torch.sparse_coo_tensor(
        np.stack([coo.row, coo.col]), coo.data.astype(np.float32),
        size=adj.shape).coalesce()
    torch.manual_seed(0)
    n = USERS + ITEMS
    ego = torch.nn.Parameter(torch.empty(n, DIM))
    torch.nn.init.xavier_uniform_(ego)
    opt = torch.optim.Adam([ego], lr=LR)
    u = torch.from_numpy(users).long()
    p = torch.from_numpy(pos).long()
    ng = torch.from_numpy(neg).long()

    def step():
        layers, h = [ego], ego
        for _ in range(LAYERS):
            h = torch.sparse.mm(a, h)
            layers.append(h)
        comb = torch.stack(layers, 1).mean(1)
        u_all, i_all = comb[:USERS], comb[USERS:]
        y_pos = (u_all[u] * i_all[p]).sum(-1)
        y_neg = (u_all[u] * i_all[ng]).sum(-1)
        loss = torch.nn.functional.softplus(y_neg - y_pos).mean()
        reg = 0.5 * (ego[u].pow(2).sum() + ego[USERS + p].pow(2).sum()
                     + ego[USERS + ng].pow(2).sum()) / BATCH
        loss = loss + REG * reg
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warm caches
    best = float("inf")
    for _ in range(BASELINE_REPEATS):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            step()
        best = min(best, time.perf_counter() - t0)
    return n_steps / best


def bench_skrx_tpu(adj, users, pos, neg, n_steps=30):
    """skrx LightGCN train step: propagation via the production graph impl
    ('mxu' Pallas kernel on TPU, XLA segment-sum elsewhere)."""
    import jax
    import jax.numpy as jnp
    import optax

    from skrx.models.common import build_prop_graph
    from skrx.ops import bpr_loss
    from skrx.ops.graph import propagate

    graph = build_prop_graph(adj, "auto")
    rs = np.random.RandomState(1)
    params = {
        "user_emb": jnp.asarray(rs.randn(USERS, DIM).astype(np.float32) * .01),
        "item_emb": jnp.asarray(rs.randn(ITEMS, DIM).astype(np.float32) * .01),
    }
    opt = optax.adam(LR)
    u = jnp.asarray(users)
    p = jnp.asarray(pos)
    ng = jnp.asarray(neg)

    def loss_fn(prm):
        ego = jnp.concatenate([prm["user_emb"], prm["item_emb"]], 0)
        layers, h = [ego], ego
        for _ in range(LAYERS):
            h = propagate(graph, h)
            layers.append(h)
        comb = jnp.mean(jnp.stack(layers, 1), 1)
        u_all, i_all = comb[:USERS], comb[USERS:]
        loss = jnp.mean(bpr_loss(jnp.sum(u_all[u] * i_all[p], -1),
                                 jnp.sum(u_all[u] * i_all[ng], -1)))
        reg = 0.5 * jnp.sum(prm["user_emb"][u] ** 2
                            + prm["item_emb"][p] ** 2
                            + prm["item_emb"][ng] ** 2) / BATCH
        return loss + REG * reg

    @jax.jit
    def step(prm, s):
        loss, grads = jax.value_and_grad(loss_fn)(prm)
        upd, s = opt.update(grads, s, prm)
        return optax.apply_updates(prm, upd), s, loss

    prm, s, loss = step(params, opt.init(params))
    float(loss)  # compile + materialize (axon: block_until_ready won't sync)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            prm, s, loss = step(prm, s)
        float(loss)
        times.append(time.perf_counter() - t0)
    return n_steps / sorted(times)[1]


def bench_eval_tpu(n_reps=20):
    """Evaluator hot loop: fused masked top-k + metrics over one eval batch
    (Pallas blockwise kernel) and its XLA mask+lax.top_k counterpart."""
    import jax.numpy as jnp

    from skrx.ops.metrics import eval_score_matrix_device

    rs = np.random.RandomState(2)
    scores = jnp.asarray(rs.randn(EVAL_B, EVAL_N).astype(np.float32))
    train_tab = jnp.asarray(
        rs.randint(0, EVAL_N, (EVAL_B, 64)).astype(np.int32))
    test_tab = jnp.asarray(
        rs.randint(0, EVAL_N, (EVAL_B, 16)).astype(np.int32))
    test_len = jnp.full((EVAL_B,), 16, jnp.int32)
    metric_ids = (1, 2, 4, 5)

    def run(use_pallas):
        def call():
            return eval_score_matrix_device(scores, train_tab, test_tab,
                                            test_len, metric_ids, EVAL_K,
                                            use_pallas=use_pallas)
        float(call()[0, 0, 0])  # compile + materialize
        times = []
        for _ in range(3):
            # dispatch back-to-back, materialize once: a per-rep host sync
            # would be dominated by the axon tunnel round trip
            t0 = time.perf_counter()
            for _ in range(n_reps):
                out = call()
            float(out[0, 0, 0])
            times.append(time.perf_counter() - t0)
        return n_reps * EVAL_B / sorted(times)[1]

    pallas_ups = run(True)
    xla_ups = run(False)
    return pallas_ups, pallas_ups / xla_ups


def main():
    adj, users, pos, neg = _graph_and_batch()
    baseline_sps = bench_reference_cpu(adj, users, pos, neg)
    tpu_sps = bench_skrx_tpu(adj, users, pos, neg)
    eval_ups, eval_vs_xla = bench_eval_tpu()
    print(json.dumps({
        "metric": "LightGCN full train step, Gowalla scale "
                  "(70k nodes, 4M edges, d=64, B=2048)"
                  " + masked-top-k eval (B=1024, N=40960, 4 metrics@50)",
        "value": round(tpu_sps * BATCH, 1),
        "unit": "examples/s",
        "vs_baseline": round(tpu_sps / baseline_sps, 2),
        "eval_users_per_s": round(eval_ups, 1),
        "eval_vs_xla": round(eval_vs_xla, 2),
    }))


if __name__ == "__main__":
    main()
