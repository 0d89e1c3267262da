"""Chunked epoch scan produces identical results to the single-program scan."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from skrx.models.pipeline import PairwiseEpochPipeline
from skrx.ops import bpr_loss


class _Train:
    num_items = 50

    def __init__(self):
        rng = np.random.default_rng(0)
        self._pairs = np.stack([rng.integers(0, 30, 2000),
                                rng.integers(0, 50, 2000)], 1).astype(np.int32)

    def to_user_item_pairs(self):
        return self._pairs

    def to_padded_positive_table(self, bucket=32):
        from skrx.io.dataset import PaddedPositives
        table = np.full((30, bucket), 50, np.int32)
        for u in range(30):
            items = np.unique(self._pairs[self._pairs[:, 0] == u, 1])[:bucket]
            table[u, : len(items)] = items
        return PaddedPositives(table, np.zeros(30, np.int32), 50)


def _run(max_scan_steps):
    train = _Train()
    pipe = PairwiseEpochPipeline(train, batch_size=128,
                                 max_scan_steps=max_scan_steps)
    params = {"u": 0.01 * jax.random.normal(jax.random.key(0), (30, 8)),
              "i": 0.01 * jax.random.normal(jax.random.key(1), (50, 8))}
    opt = optax.adam(0.01)

    def step(carry, batch):
        p, s = carry
        users, pos, neg, w = batch
        neg = neg[:, 0]

        def loss_fn(p):
            return jnp.sum(bpr_loss(jnp.sum(p["u"][users] * p["i"][pos], -1),
                                    jnp.sum(p["u"][users] * p["i"][neg], -1))
                           * w)

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), loss

    carry = (params, opt.init(params))
    for e in range(2):
        carry, loss = pipe.run_epoch(jax.random.key(e), carry, step)
    return jax.tree_util.tree_map(np.asarray, carry[0]), float(loss)


def test_chunked_matches_monolithic():
    full_p, full_l = _run(max_scan_steps=None)
    # 2000/128 -> 16 batches; chunks of 5 => 3 full chunks + remainder
    chunk_p, chunk_l = _run(max_scan_steps=5)
    np.testing.assert_allclose(chunk_l, full_l, rtol=1e-5)
    for k in full_p:
        np.testing.assert_allclose(chunk_p[k], full_p[k], rtol=1e-5,
                                   atol=1e-7)
