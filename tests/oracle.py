"""NumPy oracles mirroring the reference C++ metric math scalar-for-scalar
(metric.h:19-118, evaluate.h:24-54). Used as golden values for the on-device
kernels — deliberately written as naive loops, independent of the JAX code.
"""
import numpy as np


def eval_one_user_oracle(ratings, truth, metric_ids, top_k):
    """ratings: (N,) float; truth: set of ints. Returns (n_metrics, top_k)."""
    order = np.argsort(-ratings, kind="stable")  # ties: lower index first
    rank = order[:top_k]
    out = np.zeros((len(metric_ids), top_k), dtype=np.float64)
    truth_len = max(len(truth), 1)

    for mi, mid in enumerate(metric_ids):
        if mid == 1:  # precision
            hits = 0.0
            for i, r in enumerate(rank):
                if r in truth:
                    hits += 1
                out[mi, i] = hits / (i + 1)
        elif mid == 2:  # recall
            hits = 0.0
            for i, r in enumerate(rank):
                if r in truth:
                    hits += 1
                out[mi, i] = hits / truth_len
        elif mid == 3:  # ap
            hits = 0.0
            sum_pre = 0.0
            for i, r in enumerate(rank):
                if r in truth:
                    hits += 1
                    sum_pre += hits / (i + 1)
                out[mi, i] = sum_pre / min(truth_len, i + 1)
        elif mid == 4:  # ndcg
            dcg = 0.0
            idcg = 0.0
            for i, r in enumerate(rank):
                if r in truth:
                    dcg += 1.0 / np.log2(i + 2)
                if i < truth_len:
                    idcg += 1.0 / np.log2(i + 2)
                out[mi, i] = dcg / idcg
        elif mid == 5:  # mrr
            rr = 0.0
            for i, r in enumerate(rank):
                if r in truth:
                    rr = 1.0 / (i + 1)
                    out[mi, i:] = rr
                    break
                out[mi, i] = 0.0
        else:
            raise ValueError(mid)
    return out


def eval_score_matrix_oracle(scores, test_items, train_items, metric_ids, top_k):
    """scores: (B, N); test_items/train_items: list of arrays per row.
    Applies -inf train masking then per-user metrics. Returns (B, M, K)."""
    scores = np.array(scores, dtype=np.float64, copy=True)
    out = np.zeros((scores.shape[0], len(metric_ids), top_k))
    for b in range(scores.shape[0]):
        if train_items is not None and len(train_items[b]):
            scores[b, np.asarray(train_items[b])] = -np.inf
        out[b] = eval_one_user_oracle(scores[b], set(np.asarray(test_items[b]).tolist()),
                                      metric_ids, top_k)
    return out
