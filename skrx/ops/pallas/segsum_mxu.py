"""Sorted-COO graph propagation as windowed one-hot MXU matmuls.

TPU-native replacement for the scatter half of ``A @ x`` sparse propagation
(reference torch.sparse.mm call sites: LightGCN.py:89-100, LayerGCN.py:207-220,
FREEDOM.py:211-225 etc.). The XLA lowering of a dst-sorted
``segment_sum(x[src] * w, dst)`` on this chip splits 11ms gather / 69ms
scatter for a 4M-edge, D=64 Gowalla-scale graph — the scatter serializes at
~15 GB/s effective. This kernel removes the scatter entirely:

* **Host-side chunking (once per graph).** Edges, already sorted by
  destination, are cut into C chunks of exactly ``block_k`` edges such that
  every chunk's destinations fall inside one ``window``-row aligned output
  block (chunks are also cut at window boundaries; padding edges carry
  weight 0). Average padding at Gowalla scale is 3-10%.
* **Device gather (XLA).** ``msgs = x[src_pad] * w_pad`` — a plain gather
  XLA streams at memory bandwidth; the edge weight rides along for free.
* **Pallas scatter (grid = chunks).** Each program builds the chunk's
  one-hot destination matrix ``(block_k, window)`` on the VPU and reduces
  ``onehot^T @ msgs`` on the MXU into its window's output block. Chunks of
  the same window are consecutive, so the standard revisiting-accumulator
  pattern (zero on first visit, += after) keeps the block in VMEM; the
  window index comes from scalar-prefetch metadata. The scatter thus becomes
  pure streaming + MXU work — no dynamic stores anywhere.

The backward of ``A @ x`` is ``A^T @ g``: ``mxu_graph_from_*`` builds chunk
metadata for both directions and ``propagate_mxu`` wires them into a
``jax.custom_vjp`` (graph weights are non-differentiable constants, matching
every model in the zoo; ``edge_mask`` — per-epoch dropout — is non-diff too
and enters both directions through original-edge-id gathers).

MEASURED (TPU v5e, 4M dst-sorted edges, N=70k, D=64, block_k=512,
window=128): full propagate 21.5ms float32 / 18.5ms bfloat16-messages vs
75.4ms XLA sorted segment_sum — 3.5x / 4.1x. Kernel-only (scatter
replacement) is 14.4ms vs 68.8ms — 4.8x; the remaining cost is the XLA
gather, which is already bandwidth-bound. bfloat16 messages round the
gathered features (rel err ~1e-3); float32 uses a HIGHEST-precision matmul
(exact to ~1e-7).

End-to-end training effect (TPU v5e, LightGCN 3-layer train step, 4M
edges, D=64, batch 2048): 357ms/step segment -> 135ms float32 / 111ms
bfloat16 messages (2.6x / 3.2x).

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ChunkMeta", "MXUGraph", "chunk_sorted_coo", "mxu_graph_from_coo",
           "mxu_graph_from_sp_matrix", "propagate_mxu", "transpose_mxu_graph",
           "WeightedMXUGraph", "weighted_mxu_graph_from_coo",
           "propagate_mxu_weighted"]


class ChunkMeta(NamedTuple):
    """Chunked one-direction COO metadata (see module docstring)."""
    src_pad: jnp.ndarray    # (C*K,) int32 — gather rows into x (0 on padding)
    ldst_pad: jnp.ndarray   # (C*K, 1) int32 — dst offset within the window
    w_pad: jnp.ndarray      # (C*K,) float32 — edge weight, 0 on padding
    eidx_pad: jnp.ndarray   # (C*K,) int32 — ORIGINAL edge id (0 on padding)
    block_idx: jnp.ndarray  # (C,) int32 — output window index per chunk
    num_nodes: int
    num_windows: int
    block_k: int
    window: int


class MXUGraph(NamedTuple):
    """Bidirectional chunk metadata for ``A`` (fwd) and ``A^T`` (bwd)."""
    fwd: ChunkMeta
    bwd: ChunkMeta
    num_nodes: int
    msg_dtype: jnp.dtype = jnp.float32


def chunk_sorted_coo(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                     orig_ids: np.ndarray, num_nodes: int,
                     block_k: int = 512, window: int = 128,
                     src_sorted: bool = False) -> ChunkMeta:
    """Cut dst-sorted COO edges into fixed-size single-window chunks.

    ``dst`` must be sorted ascending. Every output window (including empty
    ones) gets at least one chunk so each output block is written.

    ``src_sorted`` re-sorts each window's edges by SOURCE row (windows stay
    contiguous; ``ldst`` and the original edge ids ride along, so the
    scatter result and ``edge_mask`` semantics are unchanged up to f32
    summation order), making the device gather ``x[src_pad]`` read
    near-monotone row addresses. MEASURED AND REJECTED as the default
    (round 4, scripts/bench_propagate.py --no-src-sort A/B on TPU v5e,
    4M edges D=64): 24.9 vs 24.6 ms per propagate, 112.8 vs 112.3 ms per
    LightGCN step — index order does not move the gather (it is
    latency-bound, consistent with the round-2 hi/lo rejection), so the
    default skips the one-time host lexsort. The option remains for
    future chips where gather coalescing matters.
    """
    num_windows = -(-num_nodes // window)
    win = dst // window
    if src_sorted and len(src):
        order = np.lexsort((src, win))
        src, dst, weight = src[order], dst[order], weight[order]
        orig_ids, win = orig_ids[order], win[order]
    counts = np.bincount(win, minlength=num_windows).astype(np.int64)
    nchunks = np.maximum(1, -(-counts // block_k))
    C = int(nchunks.sum())
    block_idx = np.repeat(np.arange(num_windows), nchunks).astype(np.int32)
    win_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    intra = np.concatenate([np.arange(m) for m in nchunks])
    chunk_start = win_starts[block_idx] + intra * block_k
    chunk_len = np.clip(counts[block_idx] - intra * block_k, 0, block_k)
    offs = np.arange(block_k)
    eidx = chunk_start[:, None] + offs[None, :]
    valid = offs[None, :] < chunk_len[:, None]
    # clip (not where-then-gather) so a zero-edge graph doesn't fancy-index
    # an empty array; padding slots read edge 0 and are masked below
    eidx_c = np.minimum(eidx, max(len(src) - 1, 0)).astype(np.int64)
    has_e = len(src) > 0
    src_pad = np.where(valid, src[eidx_c] if has_e else 0, 0).astype(np.int32)
    w_pad = np.where(valid, weight[eidx_c] if has_e else 0.0,
                     0.0).astype(np.float32)
    ldst_pad = np.where(valid,
                        (dst[eidx_c] if has_e else 0)
                        - block_idx[:, None] * window, 0).astype(np.int32)
    orig_pad = np.where(valid, orig_ids[eidx_c] if has_e else 0,
                        0).astype(np.int32)
    return ChunkMeta(jnp.asarray(src_pad.reshape(-1)),
                     jnp.asarray(ldst_pad.reshape(-1, 1)),
                     jnp.asarray(w_pad.reshape(-1)),
                     jnp.asarray(orig_pad.reshape(-1)),
                     jnp.asarray(block_idx), int(num_nodes),
                     int(num_windows), int(block_k), int(window))


def mxu_graph_from_coo(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                       num_nodes: int, block_k: Optional[int] = None,
                       window: Optional[int] = None,
                       msg_dtype=jnp.float32,
                       num_src_nodes: Optional[int] = None,
                       src_sorted: bool = False) -> MXUGraph:
    """Build fwd (A) + bwd (A^T) chunk metadata from COO edges.

    Edge order defines the original edge ids used by ``edge_mask``.
    Rectangular operators (e.g. the user x item interaction matrix R) pass
    ``num_src_nodes`` != ``num_nodes``: the forward maps (num_src_nodes, D)
    inputs to (num_nodes, D) outputs and the backward the reverse.
    ``block_k``/``window`` default to the measured autotune winners
    (skrx/ops/pallas/autotune.py) for this edge count.
    """
    if block_k is None or window is None:
        from .autotune import pick_block_sizes
        bk, win = pick_block_sizes(len(src), 64)
        block_k = bk if block_k is None else block_k
        window = win if window is None else window
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    num_src = num_nodes if num_src_nodes is None else num_src_nodes
    ids = np.arange(len(src))
    f_order = np.argsort(dst, kind="stable")
    fwd = chunk_sorted_coo(src[f_order], dst[f_order], weight[f_order],
                           ids[f_order], num_nodes, block_k, window,
                           src_sorted)
    # transpose graph: swap endpoints, sort by (new) destination = old src
    b_order = np.argsort(src, kind="stable")
    bwd = chunk_sorted_coo(dst[b_order], src[b_order], weight[b_order],
                           ids[b_order], num_src, block_k, window,
                           src_sorted)
    return MXUGraph(fwd, bwd, int(num_nodes), jnp.dtype(msg_dtype))


def transpose_mxu_graph(graph: MXUGraph) -> MXUGraph:
    """The operator A^T as an MXUGraph (swaps fwd/bwd chunk metadata) —
    shares all device buffers with the input; edge ids are unchanged, so one
    edge_mask drives both orientations."""
    return MXUGraph(graph.bwd, graph.fwd, graph.bwd.num_nodes,
                    graph.msg_dtype)


def mxu_graph_from_sp_matrix(mat: sp.spmatrix, block_k: Optional[int] = None,
                             window: Optional[int] = None,
                             msg_dtype=jnp.float32,
                             src_sorted: bool = False) -> MXUGraph:
    """Lower a square scipy sparse matrix A so propagate_mxu(g, x) == A @ x.

    Original edge ids follow CSR (row-major) order, matching
    ``graph_from_sp_matrix`` so a single (E,) edge_mask serves both
    implementations.
    """
    coo = sp.coo_matrix(sp.csr_matrix(mat))
    assert coo.shape[0] == coo.shape[1], "adjacency must be square"
    return mxu_graph_from_coo(coo.col, coo.row, coo.data, coo.shape[0],
                              block_k, window, msg_dtype,
                              src_sorted=src_sorted)


def _segsum_kernel(block_k, window, msg_dtype, blk_ref, msgs_ref, ldst_ref,
                   out_ref):
    c = pl.program_id(0)
    prev = blk_ref[jnp.maximum(c - 1, 0)]
    fresh = jnp.logical_or(c == 0, prev != blk_ref[c])
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_k, window), 1)
    # i1->bf16 select hits a Mosaic relayout bug; go through f32.
    onehot = jnp.where(cols == ldst_ref[...], 1.0, 0.0).astype(msg_dtype)
    precision = (jax.lax.Precision.HIGHEST if msg_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    part = jax.lax.dot_general(onehot, msgs_ref[...],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    @pl.when(fresh)
    def _():
        out_ref[...] = part

    @pl.when(jnp.logical_not(fresh))
    def _():
        out_ref[...] += part


def _run_direction(meta: ChunkMeta, x: jnp.ndarray, msg_dtype,
                   edge_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    K, W = meta.block_k, meta.window
    C, NW = meta.block_idx.shape[0], meta.num_windows
    D = x.shape[1]
    w = meta.w_pad
    if edge_mask is not None:
        w = w * edge_mask[meta.eidx_pad]
    msgs = x.astype(msg_dtype)[meta.src_pad] * w.astype(msg_dtype)[:, None]
    # Zero-weight (masked/padding) edges must contribute EXACT zeros even if
    # the gathered row is inf/NaN (e.g. the cotangent of an isolated node's
    # norm) — edge removal semantics, matching the segment path's pruned
    # edge lists. 0 * NaN would otherwise leak NaN into every output row.
    msgs = jnp.where((w != 0.0)[:, None], msgs, jnp.zeros_like(msgs))
    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[pl.BlockSpec((K, D), lambda c, blk: (c, 0)),
                  pl.BlockSpec((K, 1), lambda c, blk: (c, 0))],
        out_specs=pl.BlockSpec((W, D), lambda c, blk: (blk[c], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, K, W, msg_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NW * W, D), jnp.float32),
        interpret=interpret,
    )(meta.block_idx, msgs, meta.ldst_pad)
    return out[:meta.num_nodes]


def propagate_mxu(graph: MXUGraph, x: jnp.ndarray,
                  edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One step of ``A @ x`` with the MXU scatter kernel; differentiable in
    ``x`` (cotangent routed through ``A^T`` chunk metadata). Weights and
    ``edge_mask`` are non-differentiable, as in skrx.ops.graph.propagate's
    zoo usage."""
    msg_dtype = graph.msg_dtype

    @jax.custom_vjp
    def prop(x, mask):
        return _run_direction(graph.fwd, x, msg_dtype, mask)

    def prop_fwd(x, mask):
        return prop(x, mask), mask

    def prop_bwd(mask, g):
        dx = _run_direction(graph.bwd, g, msg_dtype, mask)
        dmask = None if mask is None else jnp.zeros_like(mask)
        return dx, dmask

    prop.defvjp(prop_fwd, prop_bwd)
    return prop(x, edge_mask)


class WeightedMXUGraph(NamedTuple):
    """Chunk metadata for propagation with TRACED (differentiable) per-edge
    weights — e.g. SGAT's attention coefficients. The baked ``w_pad`` is a
    0/1 validity mask; original (src, dst) arrays are kept for the weight
    cotangent ``dw_e = <g[dst_e], x[src_e]>``."""
    fwd: ChunkMeta
    bwd: ChunkMeta
    src: jnp.ndarray       # (E,) int32, original edge order
    dst: jnp.ndarray       # (E,) int32
    num_nodes: int
    msg_dtype: jnp.dtype = jnp.float32


def weighted_mxu_graph_from_coo(src: np.ndarray, dst: np.ndarray,
                                num_nodes: int, block_k: Optional[int] = None,
                                window: Optional[int] = None,
                                msg_dtype=jnp.float32,
                                num_src_nodes: Optional[int] = None
                                ) -> WeightedMXUGraph:
    ones = np.ones(len(src), np.float32)
    g = mxu_graph_from_coo(src, dst, ones, num_nodes, block_k, window,
                           msg_dtype, num_src_nodes)
    return WeightedMXUGraph(g.fwd, g.bwd,
                            jnp.asarray(np.asarray(src, np.int32)),
                            jnp.asarray(np.asarray(dst, np.int32)),
                            int(num_nodes), jnp.dtype(msg_dtype))


def propagate_mxu_weighted(graph: WeightedMXUGraph, x: jnp.ndarray,
                           weights: jnp.ndarray) -> jnp.ndarray:
    """``A(w) @ x`` where ``weights`` (E,) is a traced, differentiable value
    (attention coefficients). Differentiable in BOTH ``x`` (through A(w)^T)
    and ``weights`` (dw_e = <g[dst_e], x[src_e]> — two row gathers + a
    row-wise dot, no scatter)."""
    msg_dtype = graph.msg_dtype

    @jax.custom_vjp
    def prop(x, w):
        return _run_direction(graph.fwd, x, msg_dtype, w)

    def prop_fwd(x, w):
        return prop(x, w), (x, w)

    def prop_bwd(res, g):
        x, w = res
        dx = _run_direction(graph.bwd, g, msg_dtype, w)
        dw = jnp.einsum("ed,ed->e", g[graph.dst], x[graph.src])
        return dx, dw

    prop.defvjp(prop_fwd, prop_bwd)
    return prop(x, weights)
