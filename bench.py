"""Benchmark: BPRMF training throughput, skrx-on-TPU vs reference-style CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: BPRMF (d=64, batch 1024) on a synthetic MovieLens-100k-scale
dataset (943 users x 1682 items, ~100k interactions) — BASELINE.md config #1.

Baseline: the reference implementation cannot be built here (its Cython
extensions need Cython, absent from the image), so the baseline is a faithful
torch-CPU reimplementation of the reference's exact hot loop
(skrec/recommender/BPRMF.py:101-127 + data_iterator.py:226-234): per-epoch
numpy negative resampling with per-user exclusion, numpy->torch.from_numpy
per batch, summed BPR + L2 reg, Adam. Measured on this machine's CPU; the
skrx number is the jitted whole-epoch-on-device pipeline on the TPU.
"""
import json
import os
import sys
import time

import numpy as np

NUM_USERS, NUM_ITEMS, NUM_RATINGS = 943, 1682, 100_000
BATCH, DIM, LR, REG = 1024, 64, 1e-3, 1e-3
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_data")


def _dataset():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from skrx.io import RSDataset, synthetic
    marker = os.path.join(DATA_DIR, "synth_ratio_by_time_u3_i1")
    if not os.path.isdir(marker):
        os.makedirs(DATA_DIR, exist_ok=True)
        synthetic.make_dataset_dir(DATA_DIR, num_users=NUM_USERS,
                                   num_items=NUM_ITEMS,
                                   num_ratings=NUM_RATINGS, seed=2021)
    return RSDataset(marker, "\t", "UIRT")


def bench_reference_cpu(dataset, num_epochs=2):
    """Reference-architecture torch-CPU BPRMF epoch (per-batch host loop)."""
    import torch

    from skrx.io import PairwiseIterator

    train = dataset.train_data
    torch.manual_seed(0)
    user_emb = torch.nn.Embedding(dataset.num_users, DIM)
    item_emb = torch.nn.Embedding(dataset.num_items, DIM)
    item_bias = torch.nn.Embedding(dataset.num_items, 1)
    torch.nn.init.normal_(user_emb.weight, 0.0, 0.01)
    torch.nn.init.normal_(item_emb.weight, 0.0, 0.01)
    torch.nn.init.zeros_(item_bias.weight)
    opt = torch.optim.Adam(list(user_emb.parameters())
                           + list(item_emb.parameters())
                           + list(item_bias.parameters()), lr=LR)
    it = PairwiseIterator(train, batch_size=BATCH, shuffle=True)

    n_examples = 0
    start = time.perf_counter()
    for _ in range(num_epochs):
        for users, pos, neg in it:
            u = torch.from_numpy(users).long()
            p = torch.from_numpy(pos).long()
            n = torch.from_numpy(np.asarray(neg)).long()
            ue, pe, ne = user_emb(u), item_emb(p), item_emb(n)
            y_pos = (ue * pe).sum(-1) + item_bias(p).squeeze(-1)
            y_neg = (ue * ne).sum(-1) + item_bias(n).squeeze(-1)
            loss = -torch.nn.functional.logsigmoid(y_pos - y_neg).sum()
            reg_term = 0.5 * (ue.pow(2).sum() + pe.pow(2).sum()
                              + ne.pow(2).sum() + item_bias(p).pow(2).sum()
                              + item_bias(n).pow(2).sum())
            loss = loss + REG * reg_term
            opt.zero_grad()
            loss.backward()
            opt.step()
            n_examples += len(users)
    elapsed = time.perf_counter() - start
    return n_examples / elapsed


def bench_skrx_tpu(dataset, num_epochs=25):
    """skrx whole-epoch on-device pipeline."""
    import jax
    import jax.numpy as jnp
    import optax

    from skrx.models.pipeline import PairwiseEpochPipeline
    from skrx.ops import bpr_loss

    train = dataset.train_data
    key = jax.random.key(0)
    k_u, k_i = jax.random.split(key)
    params = {
        "user_emb": 0.01 * jax.random.normal(k_u, (dataset.num_users, DIM)),
        "item_emb": 0.01 * jax.random.normal(k_i, (dataset.num_items, DIM)),
        "item_bias": jnp.zeros((dataset.num_items,), jnp.float32),
    }
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)
    pipeline = PairwiseEpochPipeline(train, BATCH, num_neg=1)

    def loss_fn(p, batch):
        users, pos, neg, w = batch
        neg = neg[:, 0]
        ue, pe, ne = p["user_emb"][users], p["item_emb"][pos], p["item_emb"][neg]
        y_pos = jnp.sum(ue * pe, -1) + p["item_bias"][pos]
        y_neg = jnp.sum(ue * ne, -1) + p["item_bias"][neg]
        loss = jnp.sum(bpr_loss(y_pos, y_neg) * w)
        reg_term = 0.5 * jnp.sum(
            (jnp.sum(ue ** 2 + pe ** 2 + ne ** 2, -1)
             + p["item_bias"][pos] ** 2 + p["item_bias"][neg] ** 2) * w)
        return loss + REG * reg_term

    # flat-parameter fused update (framework default for dense Adam)
    from skrx.models.common import make_flat_train_step
    train_step, flat0, opt_state0, _ = make_flat_train_step(optimizer,
                                                            loss_fn, params)
    carry = (flat0, opt_state0)
    # warmup/compile; float() forces full materialization (block_until_ready
    # alone does not synchronize through the axon tunnel)
    carry, loss = pipeline.run_epoch(jax.random.fold_in(key, 999), carry,
                                     train_step)
    float(loss)

    start = time.perf_counter()
    for e in range(num_epochs):
        carry, loss = pipeline.run_epoch(jax.random.fold_in(key, e), carry,
                                         train_step)
    float(loss)
    elapsed = time.perf_counter() - start
    return num_epochs * pipeline.num_examples / elapsed


def main():
    dataset = _dataset()
    _ = dataset.train_data.to_user_item_pairs()  # force load outside timing
    baseline = bench_reference_cpu(dataset)
    tpu = bench_skrx_tpu(dataset)
    print(json.dumps({
        "metric": "BPRMF train throughput (ML-100k scale)",
        "value": round(tpu, 1),
        "unit": "examples/s",
        "vs_baseline": round(tpu / baseline, 2),
    }))


if __name__ == "__main__":
    main()
