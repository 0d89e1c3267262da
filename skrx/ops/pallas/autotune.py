"""Measured (block_k, window) selection for the segsum MXU kernel.

``scripts/tune_segsum.py`` sweeps the candidate grid on the real chip;
the winners live in ``MEASURED`` below and :func:`pick_block_sizes` returns
the nearest measured winner for a given (num_edges, dim). Callers that pass
explicit ``block_k``/``window`` bypass this entirely.

Sweep result (TPU v5e, full grid in MEASURED): ``window=128`` wins at every
size — the output block is revisited by consecutive chunks, so widening the
window only grows the one-hot build and the f32 multi-pass matmul without
saving traffic. ``block_k`` is flat between 512 and 1024 (<= 1% apart at
every measured size); 256 loses up to 25% at >= 2M edges (grid overhead),
2048 loses ~7-14% at the largest sizes (padding + less overlap). The fixed
default (512, 128) is therefore within ~1% of the per-size best everywhere
measured — the table exists to keep that claim checkable and to absorb
future chips where the balance shifts.
"""
from typing import Dict, Tuple

__all__ = ["MEASURED", "pick_block_sizes", "DEFAULT_BLOCK_K", "DEFAULT_WINDOW"]

DEFAULT_BLOCK_K = 512
DEFAULT_WINDOW = 128

# (num_edges, dim) -> (block_k, window); measured winners, TPU v5e,
# scripts/tune_segsum.py (Gowalla-like degree distribution, f32 messages).
MEASURED: Dict[Tuple[int, int], Tuple[int, int]] = {
    (396_760, 32): (512, 128),
    (396_760, 64): (512, 128),
    (1_996_906, 64): (1024, 128),   # 13.13ms vs 13.23ms for (512,128)
    (7_996_812, 64): (512, 128),    # 43.89ms
    (7_996_812, 128): (512, 128),   # 43.07ms — same as D=64: the row
    #                                 gather is latency-bound, not byte-bound
}


def pick_block_sizes(num_edges: int, dim: int) -> Tuple[int, int]:
    """Nearest measured winner in log-space edge distance (dim tie-break);
    falls back to the (512, 128) default when the table is empty."""
    if not MEASURED:
        return DEFAULT_BLOCK_K, DEFAULT_WINDOW
    import math

    def dist(key):
        e, d = key
        return (abs(math.log(max(num_edges, 1)) - math.log(e)),
                abs(math.log(max(dim, 1)) - math.log(d)))

    best = min(MEASURED, key=dist)
    return MEASURED[best]
