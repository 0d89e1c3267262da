"""Minibatch iteration over aligned arrays.

Capability parity with reference skrec/utils/py/batch_iterator.py:10-213
(a DataLoader-style Sampler/Dataset stack). Re-designed: a single vectorized
iterator over NumPy index permutations — no per-element Python sampling —
because on TPU the host batcher only has to slice already-device-ready arrays.
"""
from typing import Optional

import numpy as np

__all__ = ["BatchIterator"]


class BatchIterator:
    """Zip N aligned arrays/sequences into minibatches.

    Args:
        *arrays: equal-length sequences; each batch yields a tuple of slices
            (or a single slice if one array was given).
        batch_size: samples per batch.
        shuffle: reshuffle at every epoch (fresh permutation per ``__iter__``).
        drop_last: drop the final incomplete batch.
        rng: optional ``np.random.Generator`` for shuffles independent of the
            shared seeded host stream (skrx.utils.random.host_rng).
    """

    def __init__(self, *arrays, batch_size: int = 1024, shuffle: bool = False,
                 drop_last: bool = False, rng: Optional[np.random.Generator] = None):
        if not arrays:
            raise ValueError("at least one array is required")
        lengths = {len(a) for a in arrays}
        if len(lengths) != 1:
            raise ValueError(f"all arrays must have equal length, got {lengths}")
        self._arrays = [np.asarray(a) for a in arrays]
        self._n = len(self._arrays[0])
        self.batch_size = int(batch_size)
        if self.batch_size <= 0:
            raise ValueError("'batch_size' must be a positive integer")
        self.shuffle = shuffle
        self.drop_last = drop_last
        # None -> fetch the shared seeded host generator lazily at shuffle
        # time (set_host_seed may rebind it after this iterator is built)
        self._rng = rng

    def __len__(self):
        if self.drop_last:
            return self._n // self.batch_size
        return (self._n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        if self.shuffle:
            rng = self._rng
            if rng is None:
                from ..utils.random import host_rng
                rng = host_rng()
            order = rng.permutation(self._n)
            arrays = [a[order] for a in self._arrays]
        else:
            arrays = self._arrays
        n_batches = len(self)
        for b in range(n_batches):
            lo = b * self.batch_size
            hi = min(lo + self.batch_size, self._n)
            batch = tuple(a[lo:hi] for a in arrays)
            yield batch[0] if len(batch) == 1 else batch
