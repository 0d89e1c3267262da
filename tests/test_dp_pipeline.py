"""Data-parallel whole-epoch pipeline: sharded batches over the mesh produce
the same training trajectory as the single-device run (same PRNG keys)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from skrx.models.pipeline import PairwiseEpochPipeline
from skrx.ops import bpr_loss
from skrx.parallel import make_mesh


class _Train:
    def __init__(self, num_users=64, num_items=96, n=2000, seed=0):
        rng = np.random.default_rng(seed)
        self.num_items = num_items
        self._pairs = np.stack([rng.integers(0, num_users, n),
                                rng.integers(0, num_items, n)], 1).astype(np.int32)
        self._num_users = num_users

    def to_user_item_pairs(self):
        return self._pairs

    def to_padded_positive_table(self, bucket=32):
        from skrx.io.dataset import PaddedPositives
        table = np.full((self._num_users, bucket), self.num_items, np.int32)
        for u in range(self._num_users):
            items = np.unique(self._pairs[self._pairs[:, 0] == u, 1])[:bucket]
            table[u, : len(items)] = items
        return PaddedPositives(table, np.zeros(self._num_users, np.int32),
                               self.num_items)


def _run(mesh, epochs=2):
    train = _Train()
    pipe = PairwiseEpochPipeline(train, batch_size=256, num_neg=1, mesh=mesh)
    params = {"user_emb": 0.01 * jax.random.normal(jax.random.key(0), (64, 16)),
              "item_emb": 0.01 * jax.random.normal(jax.random.key(1), (96, 16))}
    opt = optax.adam(0.01)

    def loss_fn(p, batch):
        users, pos, neg, w = batch
        neg = neg[:, 0]
        ue, pe, ne = p["user_emb"][users], p["item_emb"][pos], p["item_emb"][neg]
        return jnp.sum(bpr_loss(jnp.sum(ue * pe, -1), jnp.sum(ue * ne, -1)) * w)

    def step(carry, batch):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), loss

    carry = (params, opt.init(params))
    for e in range(epochs):
        carry, loss = pipe.run_epoch(jax.random.key(e), carry, step)
    return jax.tree_util.tree_map(np.asarray, carry[0]), float(loss)


def test_dp_pipeline_matches_single_device():
    single_params, single_loss = _run(mesh=None)
    mesh = make_mesh((8, 1))
    dp_params, dp_loss = _run(mesh=mesh)
    np.testing.assert_allclose(dp_loss, single_loss, rtol=1e-4)
    for k in single_params:
        np.testing.assert_allclose(dp_params[k], single_params[k], rtol=1e-4,
                                   atol=1e-6)


def test_epoch_carry_buffers_are_donated():
    """run_epoch donates the carry: the input params/opt_state buffers are
    invalidated (their HBM is reused by the output) instead of staying live
    alongside the updated copy."""
    train = _Train()
    pipe = PairwiseEpochPipeline(train, batch_size=256, num_neg=1)
    params = {"user_emb": 0.01 * jax.random.normal(jax.random.key(0), (64, 16)),
              "item_emb": 0.01 * jax.random.normal(jax.random.key(1), (96, 16))}
    opt = optax.adam(0.01)

    def step(carry, batch):
        p, s = carry
        users, pos, neg, w = batch

        def loss_fn(p):
            ue = p["user_emb"][users]
            pe, ne = p["item_emb"][pos], p["item_emb"][neg[:, 0]]
            return jnp.sum(bpr_loss(jnp.sum(ue * pe, -1),
                                    jnp.sum(ue * ne, -1)) * w)

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), loss

    old_table = params["user_emb"]
    carry, loss = pipe.run_epoch(jax.random.key(0), (params, opt.init(params)),
                                 step)
    assert np.isfinite(float(loss))
    assert old_table.is_deleted()
    # the returned carry is live and usable for the next epoch
    carry, loss = pipe.run_epoch(jax.random.key(1), carry, step)
    assert np.isfinite(float(loss))
