"""Per-stage device-time profile of the masked Pallas top-k at the bench
eval shape (VERDICT r4 #6 follow-up; NEXT.md #0 headroom hunt).

Mirrors blockwise_topk's pipeline as cumulative prefixes and times each
prefix with the repo's sound metrology (in-dispatch chaining through a
small data dependency, two chain lengths differenced — the tunnel's
dispatch RTT is ~1-35 ms and would otherwise swamp every stage):

    stage 0: pack_mask only
    stage 1: + threshold pass (submax kernel over the full (B, N) read)
    stage 2: + tau selection (fold + vmem_topk)
    stage 3: + extraction pass (second full read, stage A/B)
    stage 4: + merge  (== full blockwise_topk)
    stage 5: full eval_score_matrix_device (hits + 4 metrics tail)

Consecutive differences = per-stage cost. Run on the real TPU:
    python scripts/bench_topk_stages.py [B_total]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skrx.ops.pallas import topk_blocks as tb
from skrx.ops import metrics as M

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N, K, L_TRAIN, L_TEST = 40_960, 50, 64, 16
BLOCK_N, BLOCK_B = 4096, 256
R_LONG, R_SHORT = 8, 2


def staged(scores, mask_table, test_table, test_len, stage):
    """Prefix of the blockwise_topk pipeline (mirrors topk_blocks.py)."""
    b, n = scores.shape
    n_blocks = -(-n // BLOCK_N)
    nb_b = -(-b // BLOCK_B)
    n_sub = n_blocks * 128
    k_eff = min(-(-K // 128) * 128, BLOCK_N)

    packed = tb.pack_mask(mask_table, b, n, n_blocks, BLOCK_N)
    if stage == 0:
        return packed

    bm = pl.pallas_call(
        functools.partial(tb._submax_kernel, False),
        grid=(nb_b, n_blocks),
        in_specs=[pl.BlockSpec((BLOCK_B, BLOCK_N), lambda i, j: (i, j)),
                  pl.BlockSpec((BLOCK_B, BLOCK_N // 32), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((BLOCK_B, 128), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nb_b * BLOCK_B, n_sub),
                                       scores.dtype),
    )(scores, packed)[:b]
    if stage == 1:
        return bm

    bmf = tb._fold_submaxes(bm, max(tb._TAU_MAX_W, 2 * (-(-K // 128) * 128)))
    if stage == 21:                    # old tau: k argmax rounds
        iota = jnp.broadcast_to(
            jnp.arange(bmf.shape[1], dtype=jnp.int32)[None, :], bmf.shape)
        return jnp.broadcast_to(
            tb.vmem_topk(bmf, iota, K)[0][:, K - 1:K], (b, 128))
    tau = tb.kth_largest(bmf, K)       # new tau: bitwise bisection
    if stage == 2:
        return tau

    cand_w = tb.GROUP_ROUNDS * 128 + k_eff
    vals, idx = pl.pallas_call(
        functools.partial(tb._extract_kernel, K, k_eff, False),
        grid=(nb_b, n_blocks),
        in_specs=[pl.BlockSpec((BLOCK_B, BLOCK_N), lambda i, j: (i, j)),
                  pl.BlockSpec((BLOCK_B, BLOCK_N // 32), lambda i, j: (i, j)),
                  pl.BlockSpec((BLOCK_B, 128), lambda i, j: (i, 0))],
        out_specs=(pl.BlockSpec((BLOCK_B, cand_w), lambda i, j: (i, j)),
                   pl.BlockSpec((BLOCK_B, cand_w), lambda i, j: (i, j))),
        out_shape=(jax.ShapeDtypeStruct((nb_b * BLOCK_B, n_blocks * cand_w),
                                        scores.dtype),
                   jax.ShapeDtypeStruct((nb_b * BLOCK_B, n_blocks * cand_w),
                                        jnp.int32)),
        scratch_shapes=[pltpu.VMEM((BLOCK_B, BLOCK_N), scores.dtype)],
    )(scores, packed, tau)
    vals, idx = vals[:b], idx[:b]
    if stage == 3:
        return vals[:, :128]

    if stage == 41:                    # old eval tail: merge + id-hits
        out_v, out_i = tb.merge_topk(vals, idx, K, tau=tau[:, 0])
        hits = M.hits_against_padded_truth(out_i, test_table)
        return M.ranking_metrics_from_hits(hits, test_len, (1, 2, 4, 5))
    if stage == 4:                     # merge only (predict_topk path)
        return tb.merge_topk(vals, idx, K, tau=tau[:, 0])[0]

    # new eval tail: the PRODUCTION entry (rank-count path; candidates are
    # recomputed inside, so this cum is the true standalone eval cost)
    return M.eval_score_matrix_device(scores, mask_table, test_table,
                                      test_len, (1, 2, 4, 5), K,
                                      use_pallas=True)


def timeit(fn, reps=6):
    out = fn()
    float(np.asarray(out))          # scalar: tunnel transfer is trivial
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best


def chained(stage, r, scores, mask_table, test_table, test_len):
    @jax.jit
    def run(scores, mask_table, test_table, test_len):
        dep = jnp.zeros((), jnp.int32)
        acc = jnp.zeros((), jnp.float32)
        for _ in range(r):
            mt = mask_table + dep          # tiny copy; defeats CSE
            out = staged(scores, mt, test_table, test_len, stage)
            # full-reduction dependency: every element of every stage
            # output is consumed, so XLA cannot narrow/DCE any stage work
            # in intermediate iterations (costs one read of the stage
            # output per iteration — small vs the (B, N) passes)
            s = sum(jnp.sum(leaf.astype(jnp.float32)) * 1e-30
                    for leaf in jax.tree_util.tree_leaves(out))
            acc = acc + s
            dep = s.astype(jnp.int32)
        return acc
    return timeit(lambda: run(scores, mask_table, test_table, test_len))


def main():
    rs = np.random.RandomState(0)
    print(f"B={B} N={N} K={K} chip={jax.devices()[0].device_kind}",
          flush=True)
    scores = jnp.asarray(rs.randn(B, N).astype(np.float32))
    mask_table = jnp.asarray(
        rs.randint(0, N, size=(B, L_TRAIN)).astype(np.int32))
    test_table = jnp.asarray(
        rs.randint(0, N, size=(B, L_TEST)).astype(np.int32))
    test_len = jnp.full((B,), L_TEST, jnp.int32)

    stages = [(0, "pack_mask"), (1, "+submax pass"),
              (21, "+tau OLD (vmem_topk)"), (2, "+tau NEW (bisect)"),
              (3, "+extract pass"), (41, "+OLD merge+hits+metrics"),
              (4, "+merge only (topk ids)"), (5, "+NEW rank-count+metrics")]
    cum = {}
    for stage, name in stages:
        tl = chained(stage, R_LONG, scores, mask_table, test_table, test_len)
        ts = chained(stage, R_SHORT, scores, mask_table, test_table, test_len)
        per = (tl - ts) / (R_LONG - R_SHORT)
        cum[stage] = per
        print(f"stage {stage:2d} {name:28s} cum {per*1e3:8.3f} ms",
              flush=True)
    print(f"tau:   {cum[21]-cum[1]:.4f}s old vs {cum[2]-cum[1]:.4f}s new")
    print(f"tail:  {cum[41]-cum[3]:.4f}s old vs {cum[5]-cum[3]:.4f}s new")
    print(f"eval OLD total {cum[41]*1e3:.2f} ms = "
          f"{B/cum[41]/1e3:.0f}k users/s")
    print(f"eval NEW total {cum[5]*1e3:.2f} ms = {B/cum[5]/1e3:.0f}k users/s")
    print(f"topk (ids) total {cum[4]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
