"""Host-side random sampling helpers.

Capability parity with the reference's Cython sampler wrappers
(skrec/utils/py/random.py:9-44 → pyx_random.pyx → randint.h). The TPU hot
path samples negatives **on device** (skrx/ops/sampling.py); these host
versions exist for (a) API parity, (b) offline/preprocessing use, and
(c) oracle tests against the device kernels. When the native C++ library is
built (skrx/native), these delegate to its thread-pool sampler; otherwise a
vectorized NumPy rejection sampler is used.
"""
from typing import Optional, Sequence

import numpy as np

__all__ = ["randint_choice", "batch_randint_choice", "set_host_seed",
           "host_rng"]

_rng = np.random.default_rng(2020)  # reference seeds its mt19937 with 2020 (randint.h:20)


def set_host_seed(seed: int) -> None:
    global _rng
    _rng = np.random.default_rng(seed)


def host_rng() -> np.random.Generator:
    """The shared, seeded host-side generator (reset via set_host_seed).

    Every host-side consumer (sampling here, BatchIterator shuffles) draws
    from this one stream so a seeded run is bit-reproducible across
    processes — the reference gets the same property from run_skrec.py:8's
    global numpy seeding.
    """
    return _rng


def randint_choice(high: int, size: int = 1, replace: bool = True,
                   p: Optional[np.ndarray] = None,
                   exclusion: Optional[Sequence[int]] = None) -> np.ndarray:
    """Sample `size` ints from [0, high) excluding `exclusion`.

    With replacement uses vectorized rejection; without replacement falls
    back to choice over the complement (exact).
    """
    if high <= 0:
        raise ValueError("'high' must be a positive integer.")
    if size <= 0:
        raise ValueError("'size' must be a positive integer.")

    excl = np.asarray(exclusion, dtype=np.int64) if exclusion is not None and len(exclusion) else None

    if not replace or p is not None:
        # Exact path: build the allowed set / renormalized distribution.
        if excl is not None:
            mask = np.ones(high, dtype=bool)
            mask[excl] = False
            allowed = np.nonzero(mask)[0]
            probs = None
            if p is not None:
                probs = np.asarray(p, dtype=np.float64)[allowed]
                probs = probs / probs.sum()
            result = _rng.choice(allowed, size=size, replace=replace, p=probs)
        else:
            probs = None
            if p is not None:
                probs = np.asarray(p, dtype=np.float64)
                probs = probs / probs.sum()
            result = _rng.choice(high, size=size, replace=replace, p=probs)
        return result.astype(np.int32) if size > 1 else np.int32(result)

    # Hot path: uniform with replacement + rejection against exclusion.
    if excl is None:
        out = _rng.integers(0, high, size=size)
    else:
        excl_sorted = np.unique(excl)
        if len(excl_sorted) >= high:
            raise ValueError("exclusion covers the whole range")
        out = _rng.integers(0, high, size=size)
        while True:
            pos = np.searchsorted(excl_sorted, out)
            pos = np.minimum(pos, len(excl_sorted) - 1)
            bad = excl_sorted[pos] == out
            n_bad = int(bad.sum())
            if n_bad == 0:
                break
            out[bad] = _rng.integers(0, high, size=n_bad)
    out = out.astype(np.int32)
    return out if size > 1 else np.int32(out[0])


def batch_randint_choice(high: int, size: Sequence[int], replace: bool = True,
                         p: Optional[np.ndarray] = None,
                         exclusion: Optional[Sequence[Sequence[int]]] = None) -> list:
    """Batched `randint_choice`: one draw spec per row
    (reference: random.py:26-44)."""
    if exclusion is not None and len(exclusion) != len(size):
        raise ValueError("len(exclusion) must equal len(size)")
    results = []
    for i, n in enumerate(size):
        excl = exclusion[i] if exclusion is not None else None
        results.append(randint_choice(high, size=int(n), replace=replace, p=p,
                                      exclusion=excl))
    return results
