"""Sharded sparse propagation: edge-partitioned A @ x over a device mesh.

No reference counterpart (scikit-recommender is single-GPU; SURVEY §2.4):
this extends the mesh machinery to the graph model family (LightGCN-style
propagation) so full-graph training scales past one chip's HBM.

Design (standard JAX SPMD graph pattern):

* **Node features row-sharded.** ``x`` lives row-sharded over a mesh axis,
  padded to ``n_shards * rows_per_shard``.
* **Edges partitioned by destination.** Host-side, dst-sorted edges are cut
  at shard row boundaries and padded to equal per-shard length (weight 0),
  so every device owns exactly the edges that produce its output rows.
* **One collective per layer.** Each propagate all-gathers ``x`` (N x D over
  ICI), then runs the same gather + sorted segment-sum as the single-chip
  path, writing only its local row block. The backward is automatic:
  all_gather's VJP is a reduce-scatter (psum_scatter), so gradients flow to
  the row-sharded features without any hand-written collectives.

Edge weights are non-differentiable constants, as everywhere in the zoo.
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["ShardedGraph", "sharded_graph_from_sp_matrix",
           "make_sharded_propagate", "pad_rows", "unpad_rows"]


class ShardedGraph(NamedTuple):
    """Edge partition for an n-shard mesh axis. Leading dim = shard."""
    src: jnp.ndarray        # (S, E_s) int32 — global source row ids
    dst_local: jnp.ndarray  # (S, E_s) int32 — dst offset within the shard
    weight: jnp.ndarray     # (S, E_s) float32 — 0 on padding
    num_nodes: int          # true (unpadded) node count
    rows_per_shard: int
    num_shards: int

    @property
    def padded_nodes(self) -> int:
        return self.rows_per_shard * self.num_shards


def sharded_graph_from_sp_matrix(mat: sp.spmatrix,
                                 num_shards: int) -> ShardedGraph:
    """Partition a square adjacency's edges by destination into
    ``num_shards`` contiguous row ranges (padded to equal length)."""
    coo = sp.coo_matrix(sp.csr_matrix(mat))  # dst (row) ascending
    assert coo.shape[0] == coo.shape[1], "adjacency must be square"
    n = coo.shape[0]
    rows_per = -(-n // num_shards)
    src, dst, w = (coo.col.astype(np.int64), coo.row.astype(np.int64),
                   coo.data.astype(np.float32))
    shard_of = dst // rows_per
    counts = np.bincount(shard_of, minlength=num_shards)
    e_s = max(int(counts.max()), 1)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    offs = np.arange(e_s)
    eidx = starts[:, None] + offs[None, :]
    valid = offs[None, :] < counts[:, None]
    # clip (not where-then-gather) so a zero-edge graph doesn't fancy-index
    # an empty array; padding slots read edge 0 and are masked below
    eidx_c = np.minimum(eidx, max(len(src) - 1, 0))
    # Padding dst_local = rows_per - 1 (NOT 0): each shard's valid indices
    # are ascending, and rows_per - 1 >= every valid index, so the per-shard
    # index stream stays sorted and the segment_sum sortedness hint holds.
    src_p = np.where(valid, src[eidx_c] if len(src) else 0, 0).astype(np.int32)
    dstl_p = np.where(valid,
                      (dst[eidx_c] if len(dst) else 0)
                      - (np.arange(num_shards) * rows_per)[:, None],
                      rows_per - 1).astype(np.int32)
    w_p = np.where(valid, w[eidx_c] if len(w) else 0.0,
                   0.0).astype(np.float32)
    return ShardedGraph(jnp.asarray(src_p), jnp.asarray(dstl_p),
                        jnp.asarray(w_p), n, int(rows_per), int(num_shards))


def pad_rows(x: jnp.ndarray, graph: ShardedGraph) -> jnp.ndarray:
    """Zero-pad (N, D) node features to the sharded row count."""
    pad = graph.padded_nodes - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def unpad_rows(x: jnp.ndarray, graph: ShardedGraph) -> jnp.ndarray:
    return x[:graph.num_nodes]


def _stacked_shard_metas(src, dst, w, num_shards, rows_per, block_k,
                         window):
    """Per-shard MXU chunk metadata (shard-local dst), padded to a uniform
    chunk count and stacked with a leading shard dim."""
    from ..ops.pallas.segsum_mxu import chunk_sorted_coo

    metas = []
    for s in range(num_shards):
        lo = s * rows_per
        m = (dst >= lo) & (dst < lo + rows_per)
        s_src, s_dst, s_w = src[m], dst[m] - lo, w[m]
        order = np.argsort(s_dst, kind="stable")  # chunker needs sorted dst
        ids = np.zeros(len(order), np.int64)      # edge ids unused (no masks)
        metas.append(chunk_sorted_coo(s_src[order], s_dst[order], s_w[order],
                                      ids, rows_per, block_k, window))
    c_max = max(meta.block_idx.shape[0] for meta in metas)

    def pad_stack(field, fill_last=False):
        outs = []
        for meta in metas:
            a = np.asarray(getattr(meta, field))
            c = meta.block_idx.shape[0]
            if field == "block_idx":
                pad = np.full(c_max - c, a[-1], a.dtype)
                outs.append(np.concatenate([a, pad]))
            else:
                per = a.shape[0] // c
                pad_shape = ((c_max - c) * per,) + a.shape[1:]
                outs.append(np.concatenate([a, np.zeros(pad_shape, a.dtype)]))
        return jnp.asarray(np.stack(outs))

    return (pad_stack("src_pad"), pad_stack("ldst_pad"), pad_stack("w_pad"),
            pad_stack("block_idx"), metas[0].num_windows)


def make_sharded_propagate(mesh, graph: ShardedGraph,
                           axis: str = DATA_AXIS,
                           local_impl: str = "auto",
                           block_k: int = 512, window: int = 128,
                           sp_matrix: "sp.spmatrix" = None):
    """Build ``prop(x_padded) -> A @ x`` over ``mesh`` with node rows and
    edge shards split on ``axis``. Input/output are (padded_nodes, D) arrays
    row-sharded on ``axis``; call inside or outside jit.

    ``local_impl="mxu"`` runs each device's shard-local reduction through
    the Pallas MXU scatter kernel (skrx/ops/pallas/segsum_mxu.py) instead of
    the XLA segment-sum — the production TPU configuration; requires the
    original ``sp_matrix`` to build per-shard chunk metadata (the backward
    runs the same kernel over the transpose's shard partition via a
    custom_vjp, since pallas_call has no automatic AD). ``"auto"`` picks
    "mxu" on TPU for graphs big enough that the scatter dominates (same
    policy as the single-chip path, skrx/models/common.resolve_graph_impl)
    whenever ``sp_matrix`` is provided, "segment" otherwise — so the
    multi-chip graph path rides the same kernel class as single-chip.

    Each call places the edge shards once (device_put with the right
    sharding); the returned closure is differentiable in ``x``.
    """
    from jax import shard_map

    if local_impl == "auto":
        if sp_matrix is not None:
            from ..models.common import resolve_graph_impl
            local_impl = resolve_graph_impl("auto", sp_matrix.nnz)
        else:
            local_impl = "segment"
    if local_impl == "mxu":
        return _make_sharded_propagate_mxu(mesh, graph, axis, block_k,
                                           window, sp_matrix)

    if mesh.shape[axis] != graph.num_shards:
        raise ValueError(
            f"graph was partitioned for {graph.num_shards} shards but mesh "
            f"axis {axis!r} has {mesh.shape[axis]} devices — rebuild with "
            f"sharded_graph_from_sp_matrix(mat, {mesh.shape[axis]})")

    edge_spec = NamedSharding(mesh, P(axis, None))
    src = jax.device_put(graph.src, edge_spec)
    dstl = jax.device_put(graph.dst_local, edge_spec)
    w = jax.device_put(graph.weight, edge_spec)
    rows_per = graph.rows_per_shard

    def _local(src_s, dstl_s, w_s, x_s):
        # (1, E_s) shards; x_s is this device's (rows_per, D) block
        x_full = jax.lax.all_gather(x_s, axis, axis=0, tiled=True)
        w_col = w_s[0][:, None]
        msgs = x_full[src_s[0]] * w_col
        # padding/zero-weight edges must contribute EXACT zeros even if the
        # gathered row is non-finite (0 * NaN leak) — same edge-removal
        # semantics as segsum_mxu._run_direction
        msgs = jnp.where(w_col != 0.0, msgs, jnp.zeros_like(msgs))
        out = jax.ops.segment_sum(msgs, dstl_s[0], num_segments=rows_per,
                                  indices_are_sorted=True)
        return out

    def prop(x_padded: jnp.ndarray) -> jnp.ndarray:
        f = shard_map(_local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None), P(axis, None),
                                P(axis, None)),
                      out_specs=P(axis, None), check_vma=False)
        return f(src, dstl, w, x_padded)

    return prop


def _make_sharded_propagate_mxu(mesh, graph: ShardedGraph, axis, block_k,
                                window, mat):
    from jax import shard_map
    from ..ops.pallas.segsum_mxu import ChunkMeta, _run_direction

    if mat is None:
        raise ValueError("local_impl='mxu' needs sp_matrix= to build chunk "
                         "metadata")
    if mesh.shape[axis] != graph.num_shards:
        raise ValueError(
            f"graph was partitioned for {graph.num_shards} shards but mesh "
            f"axis {axis!r} has {mesh.shape[axis]} devices")
    coo = sp.coo_matrix(sp.csr_matrix(mat))
    S, rows_per = graph.num_shards, graph.rows_per_shard
    src, dst = coo.col.astype(np.int64), coo.row.astype(np.int64)
    w = coo.data.astype(np.float32)
    fwd = _stacked_shard_metas(src, dst, w, S, rows_per, block_k, window)
    bwd = _stacked_shard_metas(dst, src, w, S, rows_per, block_k, window)
    edge_spec = NamedSharding(mesh, P(axis, None))
    edge_spec3 = NamedSharding(mesh, P(axis, None, None))

    def place(stack):
        s0, l0, w0, b0, nw = stack
        return (jax.device_put(s0, edge_spec), jax.device_put(l0, edge_spec3),
                jax.device_put(w0, edge_spec), jax.device_put(b0, edge_spec),
                nw)

    fwd, bwd = place(fwd), place(bwd)

    def run(stack, xp):
        s0, l0, w0, b0, nw = stack

        def _local(src_s, ldst_s, w_s, blk_s, x_s):
            x_full = jax.lax.all_gather(x_s, axis, axis=0, tiled=True)
            meta = ChunkMeta(src_s[0], ldst_s[0], w_s[0], src_s[0], blk_s[0],
                             rows_per, nw, block_k, window)
            return _run_direction(meta, x_full, jnp.float32, None)

        f = shard_map(_local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None, None),
                                P(axis, None), P(axis, None), P(axis, None)),
                      out_specs=P(axis, None), check_vma=False)
        return f(s0, l0, w0, b0, xp)

    @jax.custom_vjp
    def prop(xp):
        return run(fwd, xp)

    def prop_fwd(xp):
        return prop(xp), None

    def prop_bwd(_, g):
        return (run(bwd, g),)

    prop.defvjp(prop_fwd, prop_bwd)
    return prop
