"""Benchmark: LightGCN full train step at Gowalla scale, skrx-on-TPU vs the
reference-architecture torch-CPU loop, plus the evaluator hot loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"eval_users_per_s", "eval_vs_xla", "phases", ...}.

Train workload (BASELINE.md config #3): LightGCN d=64, batch 2048 on a
Gowalla-scale bipartite graph (30k users x 40k items, 2M interactions -> 4M
directed edges). Each train step runs the FULL 3-layer graph propagation
forward + backward + Adam — the chip-bound showcase of the Pallas MXU
scatter kernel (skrx/ops/pallas/segsum_mxu.py). graph_impl resolves as in
production: 'mxu_bf16' on TPU at this edge count (bf16 edge messages, f32
MXU accumulation — quality-neutral, tests/test_graph_bf16.py +
DEVIATIONS.md).

Eval workload (second hot loop, reference evaluator.py:163-214): fused
masked top-k + 4 ranking metrics @<=50 over (1024, 40960) score pages.
Round 4: G pages ride ONE device dispatch (eval_score_matrix_device_paged
— the same paging the production evaluator uses, skrx/eval/evaluator.py
_evaluate_fused_paged), so `eval_users_per_s` is dispatch-inclusive real
throughput, not per-batch dispatch overhead. `eval_vs_xla` compares the
Pallas kernel against the XLA mask+lax.top_k path through the same paged
entry on the same chip.

Baseline: the reference implementation cannot be built here (its Cython
extensions need Cython, absent from the image), so the baseline is a
faithful torch-CPU reimplementation of the reference's exact hot loop
(skrec/recommender/LightGCN.py:89-111: torch.sparse.mm K-layer propagation,
mean layer combination, mean BPR + reg*L2/batch, Adam), measured on this
machine's CPU — best of BASELINE_REPEATS timed repeats (host load can only
slow a repeat, so best-of-N estimates the unloaded machine). The measured
baseline is CACHED to bench_baseline_cpu.json keyed by a workload
fingerprint and re-measured only on a miss: the workload is frozen, and
round 3 showed the 42 s re-measure helped push the run past the driver's
budget (VERDICT r3 #1).

Robustness (VERDICT r3 #1 — the round-3 artifact was rc=124 with ZERO
output):

* A watchdog THREAD (not signal.alarm — a Python signal handler cannot
  preempt a hung C-level device call; a thread can always print and
  _exit) emits the JSON line with whatever phases completed plus a
  "truncated" field when SKRX_BENCH_DEADLINE (default 185 s) expires.
* The TPU handshake (first-compile latency through the axon tunnel is
  volatile: measured 0.4 s in-process steady state but 46-490 s for the
  FIRST compile of a fresh process, varying with tunnel congestion) is
  absorbed by a warm-up thread ONLY when there is a 42 s baseline
  re-measure to overlap; with the baseline cached, the train phase's own
  first compile is the handshake (a separate warm-up would serialize an
  extra server round in front of it — measured 48-75 s of pure added
  latency under a degraded tunnel).
* The JAX persistent compilation cache is NOT used: measured on this
  platform, warm cache READS hang or take longer than cold compiles
  (487 s warm vs 46 s cold for a trivial jit — executable
  deserialization through the tunnel is pathological). Rejection
  documented in BASELINE.md round-4 section.

All device timings force materialization with float(...)/np.asarray (axon:
block_until_ready does not sync through the tunnel); TPU numbers take the
median of 3 repeats.
"""
import json
import os
import sys
import threading
import time

import numpy as np

USERS, ITEMS, INTERACTIONS = 30_000, 40_000, 2_000_000
DIM, BATCH, LAYERS, LR, REG = 64, 2048, 3, 1e-3, 1e-3
BASELINE_REPEATS = 5
BASELINE_STEPS = 5
EVAL_B, EVAL_N, EVAL_K = 1024, 40_960, 50
EVAL_PAGES = 16
DEADLINE_S = float(os.environ.get("SKRX_BENCH_DEADLINE", "185"))
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline_cpu.json")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS = {
    "metric": "LightGCN full train step, Gowalla scale "
              "(70k nodes, 4M edges, d=64, B=2048)"
              " + paged masked-top-k eval (16x(1024, 40960), 4 metrics@50)",
    "value": None,
    "unit": "examples/s",
    "vs_baseline": None,
}
PHASES = {}
_START = time.perf_counter()
_DONE = threading.Event()


def _remaining():
    return DEADLINE_S - (time.perf_counter() - _START)
_EMIT_LOCK = threading.Lock()


def _emit(truncated=None):
    with _EMIT_LOCK:
        if RESULTS.pop("_emitted", False):
            return
        RESULTS["_emitted"] = True
        out = {k: v for k, v in RESULTS.items() if k != "_emitted"}
        if truncated:
            out["truncated"] = truncated
        out["phases"] = {k: round(v, 1) for k, v in PHASES.items()}
        print(json.dumps(out), flush=True)


def _watchdog():
    if not _DONE.wait(DEADLINE_S):
        _emit(truncated=f"deadline {DEADLINE_S:.0f}s hit; phases completed: "
                        f"{sorted(PHASES)}")
        os._exit(0)


def _tpu_warmup():
    """Absorb the per-process first-compile handshake (volatile through the
    axon tunnel) while the host phases run."""
    t0 = time.perf_counter()
    try:
        import jax
        import jax.numpy as jnp
        x = jnp.arange(931, dtype=jnp.float32)  # odd size: never pre-cached
        float(jax.jit(lambda a: (jnp.sin(a) * 1.3 + a).sum())(x))
    except Exception as e:  # surfaced in phases, not fatal
        PHASES["warmup_error"] = 0.0
        RESULTS["warmup_error"] = repr(e)
    PHASES["tpu_warmup"] = time.perf_counter() - t0


def _fingerprint():
    import torch
    return {
        "workload": [USERS, ITEMS, INTERACTIONS, DIM, BATCH, LAYERS, LR,
                     REG, BASELINE_REPEATS, BASELINE_STEPS],
        "torch": torch.__version__,
        "cpus": os.cpu_count(),
    }


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


def bench_reference_cpu(adj, users, pos, neg, n_steps=BASELINE_STEPS):
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


def _cached_baseline():
    """steps/s from bench_baseline_cpu.json on a fingerprint hit, else
    None."""
    try:
        with open(_BASELINE_FILE) as f:
            rec = json.load(f)
        if rec.get("fingerprint") == _fingerprint():
            return float(rec["steps_per_s"])
    except (OSError, ValueError, KeyError):
        pass
    return None


def baseline_steps_per_s(adj, users, pos, neg):
    """Cached CPU baseline: read bench_baseline_cpu.json on a fingerprint
    hit; measure + write on a miss."""
    cached = _cached_baseline()
    if cached is not None:
        RESULTS["baseline_cached"] = True
        return cached
    RESULTS["baseline_cached"] = False
    sps = bench_reference_cpu(adj, users, pos, neg)
    try:
        # serialize BEFORE opening: a serialization error must never
        # truncate the committed cache file
        blob = json.dumps({"fingerprint": _fingerprint(),
                           "steps_per_s": sps,
                           "note": "best-of-%d x %d-step repeats of the "
                                   "reference torch-CPU LightGCN loop"
                                   % (BASELINE_REPEATS, BASELINE_STEPS)},
                          indent=1)
        with open(_BASELINE_FILE, "w") as f:
            f.write(blob)
    except OSError:
        pass
    return sps


def build_train_step(adj, users, pos, neg):
    """skrx LightGCN train step: propagation via the production graph impl
    ('mxu_bf16' Pallas kernel on TPU at this scale, XLA segment-sum
    elsewhere)."""
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
    return step, (prm, s)


_EVAL_RESERVE_S = 45  # budget kept for the eval phase after train timing


def measure_train(step, state, n_steps=30):
    prm, s = state
    # budget-adaptive repeats (VERDICT r4 #6: measurement, not compile,
    # should dominate the wall): time the first rep, then keep adding reps
    # while the deadline leaves room for the eval phase — under a degraded
    # tunnel 1 rep still yields a valid number
    times = []
    while True:
        t0 = time.perf_counter()
        for _ in range(n_steps):
            prm, s, loss = step(prm, s)
        float(loss)
        times.append(time.perf_counter() - t0)
        if len(times) >= 24 or _remaining() < _EVAL_RESERVE_S + 2 * times[-1]:
            break
    RESULTS["train_timing_reps"] = len(times)
    return n_steps / sorted(times)[len(times) // 2]


def measure_hbm_stream(k_lo=64, k_hi=256):
    """Measured same-session streaming-read HBM rate (GB/s) — the honest
    roofline anchor for the eval kernel's stream fraction.

    Tunnel-aware metrology (round 5): host-side timing of device
    dispatches is dominated by the sync round trip, whose jitter
    (tens-to-hundreds of ms, session-dependent) exceeds the few-ms read
    time — per-dispatch and queued-async schemes both measured garbage
    (160 / 829 / 6150 GB/s across sessions). So the multi-pass read runs
    INSIDE one dispatch (``fori_loop``; the per-iteration ``abs(a + f(i))``
    is non-factorable — XLA algebraically hoists ``sum(a * (1 + eps*i))``
    and collapses the loop to O(1) reads) and two long loop lengths are
    DIFFERENCED so the single RTT offset and any in-dispatch startup ramp
    cancel in the slope. Measured ~700 GB/s (85% of the 819 GB/s paper
    peak) on the v5e — NOTE this CORRECTS round 4's "pure-read 172-237
    GB/s" ceiling, which was itself tunnel-polluted (BASELINE.md r5)."""
    import jax
    import jax.numpy as jnp

    n = 128 * (1 << 20)  # 512 MB
    x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(9), (n,),
                                          jnp.float32))()

    def k_pass(k):
        @jax.jit
        def g(a):
            def body(i, acc):
                return acc + jnp.sum(jnp.abs(a + 1e-9 * i))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return g

    def timed(g):
        float(g(x))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    slope = timed(k_pass(k_hi)) - timed(k_pass(k_lo))
    return 4 * n * (k_hi - k_lo) / max(slope, 1e-6) / 1e9


def train_traffic_bytes(nnz):
    """Analytical lower-bound HBM traffic of ONE train step (same
    accounting as scripts/roofline.py): LAYERS forward + LAYERS backward
    propagates (E message gathers + E*(idx+w) metadata + N*D write each)
    plus the dense Adam update (params+grads+2 moments r/w = 7P floats)."""
    from skrx.models.common import resolve_graph_impl
    impl = resolve_graph_impl("auto", nnz)
    n = USERS + ITEMS
    msg_b = 2 if impl == "mxu_bf16" else 4
    per_prop = nnz * DIM * msg_b + nnz * 12 + n * DIM * 4
    p = n * DIM
    return 2 * LAYERS * per_prop + 7 * p * 4, impl


def eval_prep():
    """Generate the eval pages on device and compile the Pallas paged call
    — run in a THREAD concurrent with the train compile so both compile
    requests enter the (shared, possibly congested) server queue early;
    measured back-to-back they serialize. Returns a dict consumed by
    :func:`bench_eval_tpu`, or records the error in PHASES."""
    import jax
    import jax.numpy as jnp

    from skrx.ops.metrics import eval_score_matrix_device_paged

    ctx = {}
    try:
        key = jax.random.PRNGKey(2)
        ks, kt, kv = jax.random.split(key, 3)
        gen = jax.jit(lambda: (
            jax.random.normal(ks, (EVAL_PAGES, EVAL_B, EVAL_N), jnp.float32),
            jax.random.randint(kt, (EVAL_PAGES, EVAL_B, 64), 0, EVAL_N,
                               jnp.int32),
            jax.random.randint(kv, (EVAL_PAGES, EVAL_B, 16), 0, EVAL_N,
                               jnp.int32)))
        scores_g, train_g, test_g = gen()
        test_len_g = jnp.full((EVAL_PAGES, EVAL_B), 16, jnp.int32)
        metric_ids = (1, 2, 4, 5)

        def call(use_pallas):
            return eval_score_matrix_device_paged(
                scores_g, train_g, test_g, test_len_g, metric_ids, EVAL_K,
                use_pallas=use_pallas)

        t0 = time.perf_counter()
        float(call(True)[0, 0, 0, 0])  # compile + materialize (pallas)
        PHASES["eval_compile_pallas"] = time.perf_counter() - t0
        ctx["call"] = call
    except Exception as e:  # surfaced, not fatal to the train phase
        RESULTS["eval_prep_error"] = repr(e)
    return ctx


def bench_eval_tpu(ctx, n_reps=5):
    """Evaluator hot loop, round-4 paged: G=EVAL_PAGES (1024, 40960) score
    pages through ONE dispatch of eval_score_matrix_device_paged (the
    production evaluator's paging), Pallas kernel vs the XLA
    mask+lax.top_k path. Scores/tables are generated ON DEVICE (moving
    3 GB of random pages through the tunnel is not part of the workload)
    by :func:`eval_prep`, which also pre-compiled the Pallas variant."""
    call = ctx.get("call")
    if call is None:
        return None, None

    def run(use_pallas, reserve):
        if use_pallas is False:
            t0 = time.perf_counter()
            float(call(False)[0, 0, 0, 0])  # compile + materialize
            PHASES["eval_compile_xla"] = time.perf_counter() - t0
        times = []
        while True:
            t0 = time.perf_counter()
            for _ in range(n_reps):
                out = call(use_pallas)
            float(out[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
            if len(times) >= 8 or _remaining() < reserve + 2 * times[-1]:
                break
        return n_reps * EVAL_PAGES * EVAL_B / sorted(times)[len(times) // 2]

    # reserve budget for the XLA-comparison compile + timing that follow
    pallas_ups = run(True, reserve=35)
    RESULTS["eval_users_per_s"] = round(pallas_ups, 1)
    if _remaining() < 30:   # not enough budget for the XLA comparison
        return pallas_ups, None
    xla_ups = run(False, reserve=5)
    return pallas_ups, pallas_ups / xla_ups


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    # The warm-up thread only pays off when there is host work to overlap
    # (a 42 s baseline re-measure). With the baseline cached, the train
    # phase's own first compile IS the handshake — a separate warm-up
    # would just serialize an extra server round in front of it (measured
    # 48-75 s of pure added latency under a degraded tunnel).
    warm = None
    if _cached_baseline() is None:
        warm = threading.Thread(target=_tpu_warmup, daemon=True)
        warm.start()

    # ANY phase failure must still emit the JSON with what completed (an
    # uncaught exception would exit with a traceback and no artifact —
    # the same zero-output failure mode the watchdog guards against)
    try:
        t0 = time.perf_counter()
        adj, users, pos, neg = _graph_and_batch()
        PHASES["data"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        baseline_sps = baseline_steps_per_s(adj, users, pos, neg)
        PHASES["cpu_baseline"] = time.perf_counter() - t0
        RESULTS["baseline_steps_per_s"] = round(baseline_sps, 3)

        if warm is not None:
            warm.join()

        # eval page gen + Pallas compile rides CONCURRENTLY with the train
        # compile (both requests enter the compile queue early; the train
        # MEASUREMENT below only starts after this thread is joined, so
        # the timing loop never shares the device with eval work)
        ectx = {}
        eth = threading.Thread(
            target=lambda: ectx.update(eval_prep()), daemon=True)
        eth.start()

        t0 = time.perf_counter()
        train_step, train_state = build_train_step(adj, users, pos, neg)
        PHASES["train_compile"] = time.perf_counter() - t0
        eth.join()

        t0 = time.perf_counter()
        tpu_sps = measure_train(train_step, train_state)
        PHASES["tpu_train"] = time.perf_counter() - t0
        RESULTS["value"] = round(tpu_sps * BATCH, 1)
        RESULTS["vs_baseline"] = round(tpu_sps / baseline_sps, 2)

        # self-certification (VERDICT r4 #6): achieved GB/s and fraction of
        # the chip's measured HBM roofline, from the same analytical
        # lower-bound byte counts scripts/roofline.py uses
        try:
            from skrx.utils.chip import chip_peaks
            kind, (_, _, hbm_peak) = chip_peaks()
            step_bytes, impl = train_traffic_bytes(adj.nnz)
            train_gbps = step_bytes * tpu_sps / 1e9
            RESULTS["chip"] = kind
            RESULTS["graph_impl"] = impl
            RESULTS["train_gbps"] = round(train_gbps, 1)
            RESULTS["train_roofline_frac"] = round(train_gbps * 1e9
                                                   / hbm_peak, 3)
        except Exception as e:
            RESULTS["roofline_error"] = repr(e)

        t0 = time.perf_counter()
        eval_ups, eval_vs_xla = bench_eval_tpu(ectx)
        PHASES["tpu_eval"] = time.perf_counter() - t0
        if eval_ups is not None:
            # the threshold-pruned kernel makes TWO passes over each
            # (B, N) score page (submax + extract; the rank-count tail
            # reads only the narrow candidates). eval_ups is dispatch-
            # inclusive, so this GB/s understates the device-true rate.
            # These two fields depend only on eval_ups — emit them BEFORE
            # the stream probe so a probe failure cannot drop them.
            eval_gbps = 2 * eval_ups * EVAL_N * 4 / 1e9
            RESULTS["eval_gbps"] = round(eval_gbps, 1)
            RESULTS["eval_roofline_frac"] = round(eval_gbps * 1e9
                                                  / hbm_peak, 3)
            # certify against the MEASURED same-session in-dispatch stream
            # rate (~743 GB/s repeatable — NEXT.md #0; round 4's "172-237
            # GB/s" was RTT-polluted and is retracted). The probe costs
            # two fresh compiles + ~8 timed 512 MB reductions; skip it
            # when the watchdog budget cannot absorb a stalled compile.
            if _remaining() < 25:
                RESULTS["stream_error"] = "skipped: deadline budget"
            else:
                try:
                    stream_gbps = measure_hbm_stream()
                    RESULTS["hbm_stream_gbps_measured"] = round(stream_gbps,
                                                                1)
                    RESULTS["eval_stream_frac"] = round(
                        eval_gbps / stream_gbps, 2)
                except Exception as e:
                    RESULTS["stream_error"] = repr(e)
        if eval_vs_xla is not None:
            RESULTS["eval_vs_xla"] = round(eval_vs_xla, 2)
        # compile share of wall: train_compile overlaps eval_compile_pallas
        # (threaded) — count the overlapped window once; the XLA comparison
        # compile is sequential
        compile_s = (max(PHASES.get("train_compile", 0.0),
                         PHASES.get("eval_compile_pallas", 0.0))
                     + PHASES.get("eval_compile_xla", 0.0))
        wall = time.perf_counter() - _START
        RESULTS["compile_frac_of_wall"] = round(compile_s / wall, 2)
        # the tpu_eval phase window contains the sequential XLA-comparison
        # compile — subtract it so this counts pure timing work
        RESULTS["measure_frac_of_wall"] = round(
            (PHASES.get("tpu_train", 0.0) + PHASES.get("tpu_eval", 0.0)
             - PHASES.get("eval_compile_xla", 0.0)) / wall, 2)
    except Exception as e:
        _DONE.set()
        _emit(truncated=f"phase error after {sorted(PHASES)}: {e!r:.200}")
        return

    _DONE.set()
    _emit()


if __name__ == "__main__":
    main()
