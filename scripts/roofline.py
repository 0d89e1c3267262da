"""Roofline / MFU accounting for the skrx hot kernels on the real TPU.

For each headline kernel this measures wall time and reports the achieved
HBM bandwidth and/or MXU FLOP rate as a percentage of the chip's peak, so
"is it actually fast" has a quantitative answer (VERDICT r1 #4):

  1. segsum_mxu graph propagate (Gowalla scale: 70k nodes, 4M edges, D=64)
  2. fused flat-Adam update (BPRMF-sized parameter vector)
  3. lazy (row-wise) Adam step, BPRMF B=1024
  4. full-catalog masked top-k eval batch (Pallas blockwise streaming top-k)
  5. BPRMF whole train step (sampling + grads + fused Adam)

Traffic/FLOP counts are analytical lower bounds (useful bytes / useful
flops); achieved-% is therefore conservative. All timings force
materialization with float(...) — on the axon remote platform
jax.block_until_ready does NOT synchronize through the tunnel.

Usage: python scripts/roofline.py [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip peaks: (bf16 matmul FLOP/s, f32 matmul FLOP/s, HBM bytes/s)
# v5e: 197 bf16 TFLOP/s, ~0.5x for f32 via MXU passes, 819 GB/s HBM.
# v4: 275 bf16 TFLOP/s, 1229 GB/s. Defaults fall back to v5e numbers.
# Shared with bench.py so the driver JSON self-certifies with the same
# accounting (skrx/utils/chip.py).
from skrx.utils.chip import PEAKS, chip_peaks  # noqa: E402,F401


def timeit(fn, n, materialize):
    """Differenced async-queued timing (round 5): n and 3n dispatches are
    each queued with ONE final sync, and the slope (t3n - tn)/(2n) cancels
    the sync round trip — whose session jitter (1-480 ms observed through
    the axon tunnel) otherwise pollutes few-ms kernels even when divided
    by n (see bench.py measure_hbm_stream for the pathology)."""
    out = fn()
    materialize(out)  # warm/compile

    def run(k):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn()
            materialize(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t3 = run(n), run(3 * n)
    per = (t3 - t1) / (2 * n)
    floor = t3 / (3 * n)  # per-call incl. the amortized sync — an upper
    # bound on the true time; when the differenced slope collapses under
    # sync jitter (tiny kernels), fall back to it (CONSERVATIVE: reports
    # a lower rate, never an inflated one)
    if per < 0.25 * floor:
        per = floor
    return per


def fmt_row(name, ms, gbs=None, gbs_peak=None, flops=None, flops_peak=None):
    parts = [f"{name:44s} {ms*1e3:9.2f} ms"]
    if gbs is not None:
        parts.append(f"{gbs/1e9:8.1f} GB/s ({100*gbs/gbs_peak:5.1f}% HBM)")
    if flops is not None:
        parts.append(f"{flops/1e12:7.2f} TF/s ({100*flops/flops_peak:5.1f}% MXU)")
    line = "  ".join(parts)
    print(line)
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller shapes (CPU-friendly smoke run)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    kind, (bf16_peak, f32_peak, hbm_peak) = chip_peaks()
    on_tpu = jax.default_backend() == "tpu"
    print(f"device: {kind} (backend={jax.default_backend()}) — peaks: "
          f"bf16 {bf16_peak/1e12:.0f} TF/s, f32 {f32_peak/1e12:.0f} TF/s, "
          f"HBM {hbm_peak/1e9:.0f} GB/s")
    if on_tpu and not args.quick:
        # measured same-session streaming-read anchor (in-dispatch
        # fori_loop, differenced — bench.py); % rows below use the PAPER
        # peak, this line shows how close the session's chip gets to it
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import measure_hbm_stream
        print(f"measured streaming reduce this session: "
              f"{measure_hbm_stream():.0f} GB/s")
    scale = 0.02 if args.quick else 1.0
    n_rep = 3 if args.quick else 20
    rs = np.random.RandomState(0)
    lines = []

    # ---- 1. graph propagate (A @ x), Gowalla scale --------------------
    from skrx.models.LightGCN import build_bipartite_adj
    from skrx.models.common import build_prop_graph
    from skrx.ops.graph import propagate

    U, I, D = int(30_000 * scale) + 64, int(40_000 * scale) + 64, 64
    INTER = int(2_000_000 * scale) + 1000
    pairs = np.stack([rs.randint(0, U, INTER), rs.randint(0, I, INTER)],
                     1).astype(np.int64)
    adj = build_bipartite_adj(pairs, U, I, "pre")
    N, E = U + I, adj.nnz
    x = jnp.asarray(rs.rand(N, D).astype(np.float32))
    for impl in (["segment", "mxu", "mxu_bf16"] if on_tpu else ["segment"]):
        g = build_prop_graph(adj, impl)
        f = jax.jit(lambda xx, g=g: propagate(g, xx))
        dt = timeit(lambda: f(x), n_rep, lambda o: float(jnp.sum(o[:4])))
        # useful traffic: E gathers of D f32 (or bf16 messages) + E*(idx+w)
        # + N*D write. FLOPs: for the MXU kernel, the ACTUAL one-hot matmul
        # work (chunks of block_k=512 edges x window=128 one-hot rows); for
        # the XLA scatter, the algorithmic 2*E*D MACs.
        msg_b = 2 if impl == "mxu_bf16" else 4
        traffic = E * D * msg_b + E * 12 + N * D * 4
        if impl.startswith("mxu"):
            flops = 2 * (-(-E // 512)) * 128 * 512 * D
        else:
            flops = 2 * E * D
        lines.append(fmt_row(
            f"propagate[{impl}] {N//1000}k nodes {E/1e6:.1f}M edges D={D}",
            dt, traffic / dt, hbm_peak,
            flops / dt, bf16_peak if impl == "mxu_bf16" else f32_peak))

    # ---- 2. fused flat-Adam update ------------------------------------
    P = int((943 + 1682) * 64 + 1682)  # BPRMF ML-100k param count
    P_big = int(40_000_000 * scale) + P
    flat = jnp.asarray(rs.rand(P_big).astype(np.float32))
    grads = jnp.asarray(rs.rand(P_big).astype(np.float32))
    opt = optax.adam(1e-3)
    state = opt.init(flat)

    @jax.jit
    def adam_step(f, g, s):
        upd, s = opt.update(g, s, f)
        return f + upd, s

    f2, s2 = adam_step(flat, grads, state)
    dt = timeit(lambda: adam_step(f2, grads, s2), n_rep,
                lambda o: float(o[0][0]))
    # reads: params + grads + 2 moments; writes: params + 2 moments (f32)
    traffic = 7 * P_big * 4
    lines.append(fmt_row(f"fused Adam update ({P_big/1e6:.0f}M params)", dt,
                         traffic / dt, hbm_peak))

    # ---- 3. lazy (row-wise) Adam step ----------------------------------
    from skrx.ops.optim import lazy_adam_init, lazy_adam_row_update

    NI, B = int(1_000_000 * scale) + 2048, 1024
    table = jnp.asarray(rs.rand(NI, D).astype(np.float32))
    s_l = lazy_adam_init(table)
    rows = jnp.asarray(rs.randint(0, NI, B).astype(np.int32))
    g_rows = jnp.asarray(rs.rand(B, D).astype(np.float32))

    @jax.jit
    def lazy_step(s, t, r, g):
        return lazy_adam_row_update(s, t, r, g, 1e-3)

    s3, t3 = lazy_step(s_l, table, rows, g_rows)
    dt = timeit(lambda: lazy_step(s3, t3, rows, g_rows), n_rep,
                lambda o: float(o[1][0, 0]))
    traffic = 7 * B * D * 4  # touched rows only (params+grads+moments)
    lines.append(fmt_row(
        f"lazy Adam row update (B={B} of {NI/1e6:.1f}M x {D})", dt,
        traffic / dt, hbm_peak))

    # ---- 4. full-catalog masked top-k eval batch -----------------------
    # Chained metrology (round 3): one dispatch through the axon tunnel
    # costs ~1 ms and does NOT overlap device execution, so sub-5ms kernels
    # must be timed by chaining R calls inside ONE jit via a scalar data
    # dependency (through the tiny mask table, not the 160 MB scores) —
    # see scripts/bench_topk_stream.py and BASELINE.md round-3 section.
    from skrx.ops.metrics import masked_topk_indices

    Bv, Nv = 256, int(1_000_000 * scale) + 4096
    scores = jnp.asarray(rs.rand(Bv, Nv).astype(np.float32))
    train_tab = jnp.asarray(rs.randint(0, Nv, (Bv, 64)).astype(np.int32))
    R4 = 4

    @jax.jit
    def f4(s, t):
        off = jnp.zeros((1, 1), jnp.int32)
        for _ in range(R4):
            idx = masked_topk_indices(s, t + off, 50)
            # dependency must round-trip through float: XLA folds integer
            # x*0 to a constant and then DCEs the whole chain (an int32
            # `idx[:1,:1] * 0` here compiled to an EMPTY program — the row
            # timed nothing); float x*0.0 is not foldable (NaN/inf rules).
            off = (idx[:1, :1].astype(jnp.float32) * 0.0).astype(jnp.int32)
        return off
    dt = timeit(lambda: f4(scores, train_tab), max(n_rep // 4, 2),
                lambda o: int(o[0, 0])) / R4
    traffic = Bv * Nv * 4  # one streaming read of the score matrix
    lines.append(fmt_row(
        f"masked top-50 eval (B={Bv}, N={Nv/1e6:.1f}M, chained)", dt,
        traffic / dt, hbm_peak))

    # ---- 5. BPRMF whole train step -------------------------------------
    from skrx.models.common import make_flat_train_step
    from skrx.ops import bpr_loss
    from skrx.ops.sampling import sample_negatives

    UU, II, BB = int(30_000 * scale) + 512, int(40_000 * scale) + 512, 1024
    params = {"user_emb": jnp.asarray(rs.rand(UU, D).astype(np.float32)),
              "item_emb": jnp.asarray(rs.rand(II, D).astype(np.float32)),
              "item_bias": jnp.zeros((II,), jnp.float32)}

    def loss_fn(p, batch):
        users, pos, neg = batch
        ue, pe, ne = p["user_emb"][users], p["item_emb"][pos], p["item_emb"][neg]
        return jnp.sum(bpr_loss(jnp.sum(ue * pe, -1) + p["item_bias"][pos],
                                jnp.sum(ue * ne, -1) + p["item_bias"][neg]))

    step, flat0, st0, _ = make_flat_train_step(optax.adam(1e-3), loss_fn,
                                               params)
    pos_table = np.full((UU, 8), II, np.int32)
    pos_table[:, 0] = rs.randint(0, II, UU)
    pos_table = jnp.asarray(pos_table)
    users = jnp.asarray(rs.randint(0, UU, BB).astype(np.int32))
    pos = jnp.asarray(rs.randint(0, II, BB).astype(np.int32))

    @jax.jit
    def full_step(carry, key):
        neg = sample_negatives(key, users, pos_table, II, 1)[:, 0]
        return step(carry, (users, pos, neg))

    key = jax.random.key(0)
    carry, loss = full_step((flat0, st0), key)
    float(loss)
    dt = timeit(lambda: full_step(carry, key), n_rep,
                lambda o: float(o[1]))
    P5 = (UU + II) * D + II
    traffic = 7 * P5 * 4  # dense Adam dominates at this scale
    lines.append(fmt_row(
        f"BPRMF full step (B={BB}, {UU/1e3:.0f}k x {II/1e3:.0f}k, dense Adam)",
        dt, traffic / dt, hbm_peak))

    print()
    print("NOTE: %-of-peak uses analytical LOWER-BOUND traffic/FLOPs — real "
          "kernels move more bytes (padding, one-hot blocks), so the true "
          "hardware utilization is higher than shown.")


if __name__ == "__main__":
    main()
