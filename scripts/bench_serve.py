"""Online-serving benchmark: TopKRecommender latency/QPS on the real TPU.

Measures `recommend(users)` end-to-end (host ids in -> ranked ids out,
including host<->device transfer and the seen-item mask) for a BPRMF-style
dot model at Gowalla scale, across request batch sizes.

Usage: python scripts/bench_serve.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS, ITEMS, DIM, K = 31_000, 41_000, 64, 10


def main():
    import jax.numpy as jnp

    from skrx.serve import TopKRecommender

    rs = np.random.RandomState(0)

    class _Dot:
        """Minimal trained-model stand-in: dot predict + dataset tables."""

        def __init__(self):
            self.U = jnp.asarray(rs.rand(USERS, DIM).astype(np.float32))
            self.I = jnp.asarray(rs.rand(ITEMS, DIM).astype(np.float32))

            class _TD:
                @staticmethod
                def to_padded_positive_table():
                    class _PP:
                        table = rs.randint(0, ITEMS, (USERS, 60)).astype(
                            np.int32)
                    return _PP()

            class _DS:
                train_data = _TD()
            self.dataset = _DS()

        def predict(self, users):
            return self.U[users] @ self.I.T

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


if __name__ == "__main__":
    main()
