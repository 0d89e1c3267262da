"""Online-serving benchmark: TopKRecommender latency/QPS on the real TPU.

Measures `recommend(users)` end-to-end (host ids in -> ranked ids out,
including host<->device transfer and the seen-item mask) for a BPRMF-style
dot model at Gowalla scale across request batch sizes, then the huge-catalog
path: a 1M-item catalog routed through the fused score+select kernel
(skrx/serve.py routes dot models there from >= 131072 items — the (B, N)
score matrix never exists), with a fused-vs-materialized ranking equality
check and a StableHLO export smoke on the real chip (VERDICT r2 #7).

Usage: python scripts/bench_serve.py [--skip-huge]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS, ITEMS, DIM, K = 31_000, 41_000, 64, 10
HUGE_ITEMS, HUGE_SEEN = 1_000_000, 60


def main():
    import jax.numpy as jnp

    from skrx.serve import TopKRecommender

    rs = np.random.RandomState(0)

    class _Dot:
        """Minimal trained-model stand-in: dot predict + dataset tables."""

        def __init__(self, n_items=ITEMS, n_seen=60):
            self.num_items = n_items
            self.U = jnp.asarray(rs.rand(USERS, DIM).astype(np.float32))
            self.I = jnp.asarray(rs.rand(n_items, DIM).astype(np.float32))

            class _TD:
                @staticmethod
                def to_padded_positive_table():
                    class _PP:
                        table = rs.randint(0, n_items,
                                           (USERS, n_seen)).astype(np.int32)
                    return _PP()

            class _DS:
                train_data = _TD()
            self.dataset = _DS()

        def predict(self, users):
            return self.U[users] @ self.I.T

        def _chunk_embeddings(self):
            return self.U, self.I

        def _chunk_bias(self):
            return None

    server = TopKRecommender(_Dot(), k=K)
    for bs in (1, 16, 64, 256, 1024):
        users = rs.randint(0, USERS, bs)
        server.recommend(users)  # compile
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            ids, scores = server.recommend(users)
            # recommend() returns numpy — already host-materialized
            assert ids.shape == (bs, K)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.array(lat)) * 1e3
        p50, p99 = lat[len(lat) // 2], lat[-1]

        # pipelined device throughput: dispatch 30 requests back-to-back,
        # materialize only the last — removes the per-request host<->device
        # round trip (on the axon remote platform that RTT is ~60 ms and
        # dominates every single-request number above)
        u_dev = jnp.asarray(users)
        seen_rows = server._seen[u_dev]
        out = server._rank(jnp.asarray(server.model.predict(u_dev),
                                       jnp.float32), seen_rows)
        np.asarray(out[0])
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            out = server._rank(jnp.asarray(server.model.predict(u_dev),
                                           jnp.float32), seen_rows)
        np.asarray(out[0])
        dev = (time.perf_counter() - t0) / n * 1e3
        print(f"B={bs:5d}: p50 {p50:7.2f} ms  worst {p99:7.2f} ms  "
              f"{bs / (p50 / 1e3):,.0f} users/s | pipelined {dev:6.2f} ms "
              f"-> {bs / (dev / 1e3):,.0f} users/s", flush=True)

    # StableHLO export smoke: the shared mask+rank tail AOT-exported on the
    # real chip (deployable without Python)
    blob = server.export_stablehlo(batch_size=64)
    print(f"StableHLO export (B=64, N={ITEMS}): {len(blob):,} bytes",
          flush=True)

    if "--skip-huge" in sys.argv:
        return

    # ---- huge catalog: 1M items -> fused dot_topk route ----
    huge = TopKRecommender(_Dot(n_items=HUGE_ITEMS, n_seen=HUGE_SEEN), k=K)
    assert huge._fused is not None, "1M catalog must route fused"
    for bs in (64, 256, 1024):
        users = rs.randint(0, USERS, bs)
        huge.recommend(users)  # compile
        lat = []
        for _ in range(20):
            t0 = time.perf_counter()
            ids, scores = huge.recommend(users)
            assert ids.shape == (bs, K)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.array(lat)) * 1e3
        p50 = lat[len(lat) // 2]

        u_dev = jnp.asarray(users)
        seen_rows = huge._seen[u_dev]
        uv = huge.model.U[u_dev]
        # pack once, as recommend() itself does (round 4: the per-call
        # items.T transpose is hoisted out of the serving hot path)
        from skrx.ops.pallas.dot_topk import pack_items
        packed = pack_items(huge.model.I, None)

        def call():
            return huge._fused(uv, packed, HUGE_ITEMS, seen_rows)
        np.asarray(call()[0])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = call()
        np.asarray(out[0])
        dev = (time.perf_counter() - t0) / n * 1e3
        print(f"HUGE N={HUGE_ITEMS:,} B={bs:5d}: p50 {p50:7.2f} ms  "
              f"{bs / (p50 / 1e3):,.0f} users/s | pipelined {dev:6.2f} ms "
              f"-> {bs / (dev / 1e3):,.0f} users/s", flush=True)

    # fused == materialized ranking (on-chip exactness check at 1M items):
    # the materialized path ranks a chunk of users through predict+mask+topk
    users = rs.randint(0, USERS, 64)
    ids_f, vals_f = huge.recommend(users)
    scores = jnp.asarray(huge.model.predict(jnp.asarray(users)), jnp.float32)
    ids_m, vals_m = huge._rank(scores, huge._seen[jnp.asarray(users)])
    assert np.array_equal(ids_f, np.asarray(ids_m)), "fused != materialized"
    assert np.array_equal(vals_f, np.asarray(vals_m))
    print("fused == materialized ranking at 1M items: OK", flush=True)


if __name__ == "__main__":
    main()
