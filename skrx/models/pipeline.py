"""Whole-epoch on-device training pipelines.

This is the TPU-first replacement for the reference's hot loop
(PairwiseIterator → numpy → torch.from_numpy().to(device) per batch,
BPRMF.py:108-127 / data_iterator.py:226-234): the entire epoch — shuffle
permutation, per-example negative sampling with exclusion, batching, and the
`lax.scan` over train steps — is ONE jitted XLA program. The host submits a
single call per epoch; nothing crosses the host↔device boundary in the loop.

Per-epoch negative resampling semantics are preserved (fresh fold-in of the
epoch index into the PRNG key each epoch).
"""
import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.dataset import ImplicitFeedback
from ..ops.sampling import sample_negatives

__all__ = ["PairwiseEpochPipeline", "InteractionEpochPipeline",
           "UserVecEpochPipeline", "pad_to_batches"]


def pad_to_batches(arr: np.ndarray, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad axis 0 up to a multiple of batch_size (repeating row 0) and return
    (padded, weights) where weights is 1.0 for real rows, 0.0 for padding."""
    n = len(arr)
    if n == 0:
        raise ValueError("empty training data — nothing to batch")
    n_batches = max(math.ceil(n / batch_size), 1)
    padded_n = n_batches * batch_size
    weights = np.zeros(padded_n, dtype=np.float32)
    weights[:n] = 1.0
    if padded_n == n:
        return arr, weights
    pad = np.repeat(arr[:1], padded_n - n, axis=0)
    return np.concatenate([arr, pad], axis=0), weights


def _shard_batches(mesh, batch_data):
    """Constrain (nb, B, ...) epoch batches to be sharded over the mesh's
    first axis along the batch dim (data parallelism)."""
    if mesh is None:
        return batch_data
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = mesh.axis_names[0]

    def shard(x):
        if x.ndim < 2:   # per-step scalars (e.g. walker valid flags)
            return x
        spec = P(None, axis, *([None] * (x.ndim - 2)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return tuple(shard(x) for x in batch_data)


class PairwiseEpochPipeline:
    """(user, pos_item, neg_items, weight) batches for BPR-style models.

    ``train_step(carry, batch) -> (carry, loss)`` where
    batch = (users (B,), pos (B,), neg (B, num_neg), weight (B,)).
    ``carry`` is whatever the model threads through (params, opt_state, ...).
    """

    mesh = None  # subclasses overriding __init__ inherit single-device mode
    # Cap on lax.scan length per compiled program. Very long scans of heavy
    # steps (e.g. 1000 x full-graph propagation) can exceed what the TPU
    # runtime tolerates in one executable; set to e.g. 128 to split the epoch
    # into several compiled chunks (identical numerics, a little dispatch
    # overhead). None = whole epoch in one program.
    max_scan_steps: Optional[int] = None

    def __init__(self, train_data: ImplicitFeedback, batch_size: int,
                 num_neg: int = 1, num_trials: int = 8,
                 extra_cols: Optional[Tuple[np.ndarray, ...]] = None,
                 mesh=None, max_scan_steps: Optional[int] = None):
        pairs = train_data.to_user_item_pairs()
        pp = train_data.to_padded_positive_table()
        self.num_items = train_data.num_items
        self.num_neg = num_neg
        self.num_trials = num_trials
        self.batch_size = batch_size
        # optional jax.sharding.Mesh: per-step batches are sharded over the
        # 'data' axis (params stay replicated unless the caller shards them)
        self.mesh = mesh

        users, self._weights = pad_to_batches(pairs[:, 0], batch_size)
        pos, _ = pad_to_batches(pairs[:, 1], batch_size)
        self.num_batches = len(users) // batch_size
        self.num_examples = len(pairs)
        self._users = jnp.asarray(users)
        self._pos = jnp.asarray(pos)
        self._w = jnp.asarray(self._weights)
        self._pos_table = jnp.asarray(pp.table)
        self._extra = tuple(jnp.asarray(pad_to_batches(c, batch_size)[0])
                            for c in (extra_cols or ()))
        self.max_scan_steps = max_scan_steps
        self._compiled = {}

    def run_epoch(self, key: jax.Array, carry, train_step: Callable):
        """Run one full epoch on device; returns (carry, mean_loss)."""
        if (self.max_scan_steps is not None
                and self.num_batches > self.max_scan_steps):
            return self._run_epoch_chunked(key, carry, train_step)
        fn = self._compiled.get(train_step)
        if fn is None:
            # donate the carry (params/opt_state): the epoch output reuses
            # its HBM instead of holding live input + output copies of the
            # embedding tables across the jit boundary. Callers always
            # reassign from the returned carry.
            fn = jax.jit(partial(self._epoch_impl, train_step),
                         donate_argnums=1)
            self._compiled[train_step] = fn
        carry, loss = fn(key, carry, self._users, self._pos, self._w,
                         self._pos_table, *self._extra)
        return carry, loss

    def _prepare_batches(self, key, users, pos, w, pos_table, *extra):
        """Shuffle + sample negatives + reshape into (nb, B, ...) batches."""
        k_perm, k_neg = jax.random.split(key)
        s = users.shape[0]
        perm = jax.random.permutation(k_perm, s)
        users, pos, w = users[perm], pos[perm], w[perm]
        extra = tuple(e[perm] for e in extra)
        neg = sample_negatives(k_neg, users, pos_table, self.num_items,
                               self.num_neg, self.num_trials)
        nb, b = self.num_batches, self.batch_size
        batch_data = (users.reshape(nb, b),
                      pos.reshape((nb, b) + pos.shape[1:]),
                      neg.reshape(nb, b, self.num_neg), w.reshape(nb, b),
                      *(e.reshape((nb, b) + e.shape[1:]) for e in extra))
        return _shard_batches(self.mesh, batch_data)

    def _epoch_impl(self, train_step, key, carry, users, pos, w, pos_table,
                    *extra):
        batch_data = self._prepare_batches(key, users, pos, w, pos_table,
                                           *extra)

        def body(c, batch):
            c, loss = train_step(c, batch)
            return c, loss

        carry, losses = jax.lax.scan(body, carry, batch_data)
        return carry, jnp.mean(losses)

    def _run_epoch_chunked(self, key, carry, train_step):
        """Split the epoch scan into <= max_scan_steps compiled chunks."""
        fns = self._compiled.get(("chunked", train_step))
        if fns is None:
            prep = jax.jit(self._prepare_batches)

            def chunk_impl(c, chunk):
                def body(c, batch):
                    c, loss = train_step(c, batch)
                    return c, loss

                c, losses = jax.lax.scan(body, c, chunk)
                return c, jnp.sum(losses)

            fns = (prep, jax.jit(chunk_impl, donate_argnums=0))
            self._compiled[("chunked", train_step)] = fns
        prep, chunk_fn = fns

        batch_data = prep(key, self._users, self._pos, self._w,
                          self._pos_table, *self._extra)
        nb = self.num_batches
        c = self.max_scan_steps
        total = jnp.asarray(0.0)
        lo = 0
        # equal-size chunks + one remainder chunk => at most 2 compilations
        while lo < nb:
            size = min(c, nb - lo)
            chunk = tuple(x[lo: lo + size] for x in batch_data)
            carry, loss_sum = chunk_fn(carry, chunk)
            total = total + loss_sum
            lo += size
        return carry, total / nb


class SequentialPairwiseEpochPipeline(PairwiseEpochPipeline):
    """Prefix-expanded sequential examples: batch =
    (users (B,), pos_next (B,[num_next]), neg_next (B, num_next), weight,
    prev_items (B, num_previous)).

    Mirrors the reference SequentialPairwiseIterator semantics
    (data_iterator.py:293-335): one example per chronological prefix of each
    user's sequence, negatives excluded against ALL of the user's positives,
    resampled every epoch — but built once host-side and iterated fully on
    device.
    """

    def __init__(self, train_data: ImplicitFeedback, batch_size: int,
                 num_previous: int = 1, num_next: int = 1,
                 pad: Optional[int] = None, num_trials: int = 8, mesh=None):
        from ..io.data_iterator import _generate_time_order_positive_items

        user_pos_dict = train_data.to_user_dict_by_time()
        _, users, prev_items, next_items = _generate_time_order_positive_items(
            user_pos_dict, num_previous=num_previous, num_next=num_next,
            pad=pad)
        pp = train_data.to_padded_positive_table()
        self.num_items = train_data.num_items
        self.num_neg = num_next  # one negative per next-item slot
        self.num_trials = num_trials
        self.batch_size = batch_size

        self.mesh = mesh
        pos = next_items if num_next > 1 else next_items[:, 0]
        users_p, self._weights = pad_to_batches(users, batch_size)
        pos_p, _ = pad_to_batches(pos, batch_size)
        prev_p, _ = pad_to_batches(prev_items, batch_size)
        self.num_batches = len(users_p) // batch_size
        self.num_examples = len(users)
        self._users = jnp.asarray(users_p)
        self._pos = jnp.asarray(pos_p)
        self._w = jnp.asarray(self._weights)
        self._pos_table = jnp.asarray(pp.table)
        self._extra = (jnp.asarray(prev_p),)
        self._compiled = {}


class InteractionEpochPipeline:
    """(user, pos_item, weight) batches — no negatives (SelfCF/BM3/SLMRec
    style, reference InteractionIterator)."""

    max_scan_steps: Optional[int] = None

    def __init__(self, train_data: ImplicitFeedback, batch_size: int,
                 max_scan_steps: Optional[int] = None, mesh=None):
        pairs = train_data.to_user_item_pairs()
        self.batch_size = batch_size
        self.max_scan_steps = max_scan_steps
        self.mesh = mesh
        users, self._weights = pad_to_batches(pairs[:, 0], batch_size)
        pos, _ = pad_to_batches(pairs[:, 1], batch_size)
        self.num_batches = len(users) // batch_size
        self.num_examples = len(pairs)
        self._users = jnp.asarray(users)
        self._pos = jnp.asarray(pos)
        self._w = jnp.asarray(self._weights)
        self._compiled = {}

    def run_epoch(self, key: jax.Array, carry, train_step: Callable):
        if (self.max_scan_steps is not None
                and self.num_batches > self.max_scan_steps):
            return self._run_epoch_chunked(key, carry, train_step)
        fn = self._compiled.get(train_step)
        if fn is None:
            fn = jax.jit(partial(self._epoch_impl, train_step),
                         donate_argnums=1)
            self._compiled[train_step] = fn
        return fn(key, carry, self._users, self._pos, self._w)

    def _prepare_batches(self, key, users, pos, w):
        perm = jax.random.permutation(key, users.shape[0])
        users, pos, w = users[perm], pos[perm], w[perm]
        nb, b = self.num_batches, self.batch_size
        return _shard_batches(self.mesh,
                              (users.reshape(nb, b), pos.reshape(nb, b),
                               w.reshape(nb, b)))

    def _epoch_impl(self, train_step, key, carry, users, pos, w):
        batch_data = self._prepare_batches(key, users, pos, w)

        def body(c, batch):
            c, loss = train_step(c, batch)
            return c, loss

        carry, losses = jax.lax.scan(body, carry, batch_data)
        return carry, jnp.mean(losses)

    def _run_epoch_chunked(self, key, carry, train_step):
        fns = self._compiled.get(("chunked", train_step))
        if fns is None:
            prep = jax.jit(self._prepare_batches)

            def chunk_impl(c, chunk):
                def body(c, batch):
                    c, loss = train_step(c, batch)
                    return c, loss

                c, losses = jax.lax.scan(body, c, chunk)
                return c, jnp.sum(losses)

            fns = (prep, jax.jit(chunk_impl, donate_argnums=0))
            self._compiled[("chunked", train_step)] = fns
        prep, chunk_fn = fns
        batch_data = prep(key, self._users, self._pos, self._w)
        nb, c = self.num_batches, self.max_scan_steps
        total = jnp.asarray(0.0)
        lo = 0
        while lo < nb:
            size = min(c, nb - lo)
            chunk = tuple(x[lo: lo + size] for x in batch_data)
            carry, loss_sum = chunk_fn(carry, chunk)
            total = total + loss_sum
            lo += size
        return carry, total / nb


class UserVecEpochPipeline:
    """(user_ids, dense user-vector rows, weight) batches for autoencoder /
    VAE models (reference UserVecIterator).

    The full (U, N) interaction matrix is NEVER materialized: interactions
    live as the padded per-user positive table (U, maxPos) and each batch's
    dense (B, N) rows are scattered on device inside the step — memory is
    O(U*maxPos + B*N) instead of O(U*N) (at ML-20M scale that is the
    difference between ~200 MB and ~15 GB of HBM)."""

    def __init__(self, train_data: ImplicitFeedback, batch_size: int,
                 mesh=None):
        self.batch_size = batch_size
        self.mesh = mesh
        self.num_items = train_data.num_items
        pp = train_data.to_padded_positive_table()
        users = np.nonzero(pp.lengths > 0)[0].astype(np.int32)
        users, self._weights = pad_to_batches(users, batch_size)
        self.num_batches = len(users) // batch_size
        self.num_examples = int((pp.lengths > 0).sum())
        self._users = jnp.asarray(users)
        self._w = jnp.asarray(self._weights)
        self._pos_table = jnp.asarray(pp.table)
        self._compiled = {}

    def rows_for(self, users: jnp.ndarray,
                 pos_table: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Dense 0/1 interaction rows (B, N) for the given users, scattered
        on device from the padded table (pad id drops). ``pos_table``
        overrides the stored table (the epoch program passes its traced
        copy so train and inference densification share one code path)."""
        table = self._pos_table if pos_table is None else pos_table
        table_rows = table[users]                            # (B, P)
        b = users.shape[0]
        rows = jnp.zeros((b, self.num_items + 1), jnp.float32)
        rows = rows.at[jnp.arange(b)[:, None], table_rows].set(1.0,
                                                               mode="drop")
        return rows[:, : self.num_items]

    def run_epoch(self, key: jax.Array, carry, train_step: Callable):
        fn = self._compiled.get(train_step)
        if fn is None:
            fn = jax.jit(partial(self._epoch_impl, train_step),
                         donate_argnums=1)
            self._compiled[train_step] = fn
        return fn(key, carry, self._users, self._w, self._pos_table)

    def _epoch_impl(self, train_step, key, carry, users, w, pos_table):
        k_perm, k_step = jax.random.split(key)
        perm = jax.random.permutation(k_perm, users.shape[0])
        users, w = users[perm], w[perm]
        nb, b = self.num_batches, self.batch_size
        step_keys = jax.random.split(k_step, nb)
        batch_data = _shard_batches(
            self.mesh, (users.reshape(nb, b), w.reshape(nb, b))) + (step_keys,)

        def body(c, batch):
            u, wt, k = batch
            rows = self.rows_for(u, pos_table)
            c, loss = train_step(c, (u, rows, wt, k))
            return c, loss

        carry, losses = jax.lax.scan(body, carry, batch_data)
        return carry, jnp.mean(losses)
