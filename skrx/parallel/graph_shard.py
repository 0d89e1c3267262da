"""Sharded sparse propagation: edge-partitioned A @ x over a device mesh.

No reference counterpart (scikit-recommender is single-GPU; SURVEY §2.4):
this extends the mesh machinery to the graph model family (LightGCN-style
propagation, reference skrec/recommender/LightGCN.py:89-100) so full-graph
training scales past one chip's HBM.

Design (standard JAX SPMD graph pattern):

* **Node features row-sharded.** ``x`` lives row-sharded over one or more
  mesh axes, padded to ``n_shards * rows_per_shard``.
* **Edges partitioned by destination.** Host-side, dst-sorted edges are cut
  at shard row boundaries and padded to equal per-shard length (weight 0),
  so every device owns exactly the edges that produce its output rows.
* **One collective per layer.** Each propagate all-gathers ``x`` (N x D over
  ICI), then runs the same gather + sorted segment-sum as the single-chip
  path, writing only its local row block. The backward is automatic:
  all_gather's VJP is a reduce-scatter (psum_scatter), so gradients flow to
  the row-sharded features without any hand-written collectives.
* **Edge masks in original edge order.** Every shard keeps the ORIGINAL
  edge id of each slot, so the per-epoch dropout/pruning masks the models
  already compute (a single (E,) float in the adjacency's canonical edge
  order — see skrx.ops.graph.propagate) apply unchanged to the sharded
  layout. Edge weights/masks are non-differentiable constants, as
  everywhere in the zoo.

:class:`ShardedPropGraph` is the model-facing wrapper:
``skrx.ops.graph.propagate`` dispatches on it, so a graph model becomes
mesh-sharded simply by building its graph with
``models.common.build_prop_graph(adj, impl, mesh=self.mesh)``.
"""
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["ShardedGraph", "sharded_graph_from_sp_matrix",
           "sharded_graph_from_coo", "make_sharded_propagate",
           "ShardedPropGraph", "pad_rows", "unpad_rows"]

AxisSpec = Union[str, Tuple[str, ...]]


def _axes(axis: AxisSpec) -> Tuple[str, ...]:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _axis_size(mesh, axis: AxisSpec) -> int:
    size = 1
    for a in _axes(axis):
        size *= mesh.shape[a]
    return size


class ShardedGraph(NamedTuple):
    """Edge partition for an n-shard mesh axis. Leading dim = shard."""
    src: jnp.ndarray        # (S, E_s) int32 — global source row ids
    dst_local: jnp.ndarray  # (S, E_s) int32 — dst offset within the shard
    weight: jnp.ndarray     # (S, E_s) float32 — 0 on padding
    edge_id: jnp.ndarray    # (S, E_s) int32 — original edge id (0 on padding)
    num_nodes: int          # true (unpadded) node count
    rows_per_shard: int
    num_shards: int

    @property
    def padded_nodes(self) -> int:
        return self.rows_per_shard * self.num_shards


def sharded_graph_from_coo(src: np.ndarray, dst: np.ndarray,
                           weight: np.ndarray, num_nodes: int,
                           num_shards: int) -> ShardedGraph:
    """Partition COO edges by destination into ``num_shards`` contiguous
    row ranges (padded to equal length). The INPUT order defines the edge
    ids an ``edge_mask`` indexes (matching ``mxu_graph_from_coo``)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = np.asarray(weight, dtype=np.float32)
    ids = np.arange(len(src), dtype=np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst, w, ids = src[order], dst[order], w[order], ids[order]
    n = int(num_nodes)
    rows_per = -(-n // num_shards)
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
    has_e = len(src) > 0
    # Padding dst_local = rows_per - 1 (NOT 0): each shard's valid indices
    # are ascending, and rows_per - 1 >= every valid index, so the per-shard
    # index stream stays sorted and the segment_sum sortedness hint holds.
    src_p = np.where(valid, src[eidx_c] if has_e else 0, 0).astype(np.int32)
    dstl_p = np.where(valid,
                      (dst[eidx_c] if has_e else 0)
                      - (np.arange(num_shards) * rows_per)[:, None],
                      rows_per - 1).astype(np.int32)
    w_p = np.where(valid, w[eidx_c] if has_e else 0.0,
                   0.0).astype(np.float32)
    id_p = np.where(valid, ids[eidx_c] if has_e else 0, 0).astype(np.int32)
    return ShardedGraph(jnp.asarray(src_p), jnp.asarray(dstl_p),
                        jnp.asarray(w_p), jnp.asarray(id_p),
                        n, int(rows_per), int(num_shards))


def sharded_graph_from_sp_matrix(mat: sp.spmatrix,
                                 num_shards: int) -> ShardedGraph:
    """Partition a square adjacency's edges by destination into
    ``num_shards`` contiguous row ranges (padded to equal length). Edge ids
    follow canonical CSR order, matching ``graph_from_sp_matrix`` /
    ``mxu_graph_from_sp_matrix`` so one (E,) edge_mask serves all three."""
    coo = sp.coo_matrix(sp.csr_matrix(mat))  # dst (row) ascending
    assert coo.shape[0] == coo.shape[1], "adjacency must be square"
    return sharded_graph_from_coo(coo.col, coo.row, coo.data, coo.shape[0],
                                  num_shards)


def pad_rows(x: jnp.ndarray, graph: ShardedGraph) -> jnp.ndarray:
    """Zero-pad (N, D) node features to the sharded row count."""
    pad = graph.padded_nodes - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def unpad_rows(x: jnp.ndarray, graph: ShardedGraph) -> jnp.ndarray:
    return x[:graph.num_nodes]


def _shard_edge_arrays(mat_or_coo, num_shards: int, rows_per: int):
    """Split canonical-order COO (+ ids) into per-shard dst-sorted arrays."""
    src, dst, w, ids = mat_or_coo
    parts = []
    for s in range(num_shards):
        lo = s * rows_per
        m = (dst >= lo) & (dst < lo + rows_per)
        s_src, s_dst, s_w, s_ids = src[m], dst[m] - lo, w[m], ids[m]
        order = np.argsort(s_dst, kind="stable")  # chunker needs sorted dst
        parts.append((s_src[order], s_dst[order], s_w[order], s_ids[order]))
    return parts


def _stacked_shard_metas(coo, num_shards, rows_per, block_k, window):
    """Per-shard MXU chunk metadata (shard-local dst), padded to a uniform
    chunk count and stacked with a leading shard dim. Edge ids are the
    ORIGINAL global ids so replicated (E,) edge masks index correctly."""
    from ..ops.pallas.segsum_mxu import chunk_sorted_coo

    metas = [chunk_sorted_coo(s_src, s_dst, s_w, s_ids, rows_per, block_k,
                              window)
             for s_src, s_dst, s_w, s_ids
             in _shard_edge_arrays(coo, num_shards, rows_per)]
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
            pad_stack("eidx_pad"), pad_stack("block_idx"),
            metas[0].num_windows)


def make_sharded_propagate(mesh, graph: ShardedGraph,
                           axis: AxisSpec = DATA_AXIS,
                           local_impl: str = "auto",
                           block_k: Optional[int] = None,
                           window: Optional[int] = None,
                           coo_edges=None, sp_matrix: "sp.spmatrix" = None):
    """Build ``prop(x_padded, edge_mask=None) -> A @ x`` over ``mesh`` with
    node rows and edge shards split on ``axis`` (a mesh axis name or a tuple
    of names — the shard count is the product of their sizes). Input/output
    are (padded_nodes, D) arrays row-sharded on ``axis``; call inside or
    outside jit. ``edge_mask`` is an optional replicated (E,) float in the
    graph's original edge order (dropout/pruning), non-differentiable.

    ``local_impl="mxu"`` runs each device's shard-local reduction through
    the Pallas MXU scatter kernel (skrx/ops/pallas/segsum_mxu.py) instead of
    the XLA segment-sum — the production TPU configuration; requires the
    original edges (``sp_matrix`` or ``coo_edges=(src, dst, w)``) to build
    per-shard chunk metadata (the backward runs the same kernel over the
    transpose's shard partition via a custom_vjp, since pallas_call has no
    automatic AD). ``"auto"`` picks "mxu" on TPU for graphs big enough that
    the scatter dominates (same policy as the single-chip path,
    skrx/models/common.resolve_graph_impl) whenever the edges are provided,
    "segment" otherwise — so the multi-chip graph path rides the same
    kernel class as single-chip.

    Each call places the edge shards once (device_put with the right
    sharding); the returned closure is differentiable in ``x``.
    """
    from jax import shard_map

    coo = _canonical_coo(coo_edges, sp_matrix)
    if local_impl == "auto":
        local_impl = _resolve_local_impl(coo)
    if local_impl.startswith("mxu"):
        from ..models.common import mxu_msg_dtype
        return _make_sharded_propagate_mxu(mesh, graph, axis, block_k,
                                           window, coo,
                                           mxu_msg_dtype(local_impl))

    if _axis_size(mesh, axis) != graph.num_shards:
        raise ValueError(
            f"graph was partitioned for {graph.num_shards} shards but mesh "
            f"axis {axis!r} has {_axis_size(mesh, axis)} devices — rebuild "
            f"with sharded_graph_from_sp_matrix(mat, {_axis_size(mesh, axis)})")

    axes = _axes(axis)
    edge_spec = NamedSharding(mesh, P(axes, None))
    src = jax.device_put(graph.src, edge_spec)
    dstl = jax.device_put(graph.dst_local, edge_spec)
    w = jax.device_put(graph.weight, edge_spec)
    eids = jax.device_put(graph.edge_id, edge_spec)
    rows_per = graph.rows_per_shard

    def _local(src_s, dstl_s, w_s, x_s, mask_s=None):
        # (1, E_s) shards; x_s is this device's (rows_per, D) block
        x_full = jax.lax.all_gather(x_s, axes, axis=0, tiled=True)
        w_eff = w_s[0] if mask_s is None else w_s[0] * mask_s
        w_col = w_eff[:, None]
        msgs = x_full[src_s[0]] * w_col
        # padding/zero-weight/masked-out edges must contribute EXACT zeros
        # even if the gathered row is non-finite (0 * NaN leak) — same
        # edge-removal semantics as segsum_mxu._run_direction
        msgs = jnp.where(w_col != 0.0, msgs, jnp.zeros_like(msgs))
        out = jax.ops.segment_sum(msgs, dstl_s[0], num_segments=rows_per,
                                  indices_are_sorted=True)
        return out

    spec_e = P(axes, None)
    fns = {}

    def prop(x_padded: jnp.ndarray,
             edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if edge_mask is None:
            f = fns.get("plain")
            if f is None:
                f = fns["plain"] = shard_map(
                    _local, mesh=mesh,
                    in_specs=(spec_e, spec_e, spec_e, spec_e),
                    out_specs=spec_e, check_vma=False)
            return f(src, dstl, w, x_padded)
        f = fns.get("masked")
        if f is None:
            def _masked(src_s, dstl_s, w_s, eid_s, x_s, mask):
                return _local(src_s, dstl_s, w_s, x_s, mask[eid_s[0]])

            f = fns["masked"] = shard_map(
                _masked, mesh=mesh,
                in_specs=(spec_e, spec_e, spec_e, spec_e, spec_e, P(None)),
                out_specs=spec_e, check_vma=False)
        return f(src, dstl, w, eids, x_padded, edge_mask)

    return prop


def _canonical_coo(coo_edges, sp_matrix):
    """(src, dst, w, ids) in the mask's edge-id order, or None."""
    if coo_edges is not None:
        src, dst, w = coo_edges
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.asarray(w, dtype=np.float32)
        return src, dst, w, np.arange(len(src), dtype=np.int64)
    if sp_matrix is not None:
        coo = sp.coo_matrix(sp.csr_matrix(sp_matrix))
        return (coo.col.astype(np.int64), coo.row.astype(np.int64),
                coo.data.astype(np.float32),
                np.arange(coo.nnz, dtype=np.int64))
    return None


def _resolve_local_impl(coo) -> str:
    if coo is None:
        return "segment"
    from ..models.common import resolve_graph_impl
    return resolve_graph_impl("auto", len(coo[0]))


def _make_sharded_propagate_mxu(mesh, graph: ShardedGraph, axis, block_k,
                                window, coo, msg_dtype=jnp.float32):
    from jax import shard_map
    from ..ops.pallas.segsum_mxu import ChunkMeta, _run_direction

    if coo is None:
        raise ValueError("local_impl='mxu' needs sp_matrix= or coo_edges= "
                         "to build chunk metadata")
    if _axis_size(mesh, axis) != graph.num_shards:
        raise ValueError(
            f"graph was partitioned for {graph.num_shards} shards but mesh "
            f"axis {axis!r} has {_axis_size(mesh, axis)} devices")
    axes = _axes(axis)
    S, rows_per = graph.num_shards, graph.rows_per_shard
    src, dst, w, ids = coo
    if block_k is None or window is None:
        from ..ops.pallas.autotune import pick_block_sizes
        bk, win = pick_block_sizes(max(len(src) // S, 1), 64)
        block_k = bk if block_k is None else block_k
        window = win if window is None else window
    fwd = _stacked_shard_metas((src, dst, w, ids), S, rows_per, block_k,
                               window)
    bwd = _stacked_shard_metas((dst, src, w, ids), S, rows_per, block_k,
                               window)
    edge_spec = NamedSharding(mesh, P(axes, None))
    edge_spec3 = NamedSharding(mesh, P(axes, None, None))

    def place(stack):
        s0, l0, w0, e0, b0, nw = stack
        return (jax.device_put(s0, edge_spec), jax.device_put(l0, edge_spec3),
                jax.device_put(w0, edge_spec), jax.device_put(e0, edge_spec),
                jax.device_put(b0, edge_spec), nw)

    fwd, bwd = place(fwd), place(bwd)
    spec_e = P(axes, None)
    fns = {}

    def run(tag, stack, xp, mask):
        s0, l0, w0, e0, b0, nw = stack

        def _local(src_s, ldst_s, w_s, eid_s, blk_s, x_s, *mask_arg):
            x_full = jax.lax.all_gather(x_s, axes, axis=0, tiled=True)
            meta = ChunkMeta(src_s[0], ldst_s[0], w_s[0], eid_s[0], blk_s[0],
                             rows_per, nw, block_k, window)
            m = mask_arg[0] if mask_arg else None
            return _run_direction(meta, x_full, msg_dtype, m)

        key = (tag, mask is not None)
        f = fns.get(key)
        if f is None:
            in_specs = (spec_e, P(axes, None, None), spec_e, spec_e, spec_e,
                        spec_e) + ((P(None),) if mask is not None else ())
            f = fns[key] = shard_map(_local, mesh=mesh, in_specs=in_specs,
                                     out_specs=spec_e, check_vma=False)
        args = (s0, l0, w0, e0, b0, xp) + ((mask,) if mask is not None else ())
        return f(*args)

    @jax.custom_vjp
    def prop_plain(xp):
        return run("fwd", fwd, xp, None)

    prop_plain.defvjp(lambda xp: (prop_plain(xp), None),
                      lambda _, g: (run("bwd", bwd, g, None),))

    @jax.custom_vjp
    def prop_masked(xp, mask):
        return run("fwd", fwd, xp, mask)

    prop_masked.defvjp(
        lambda xp, mask: (prop_masked(xp, mask), mask),
        lambda mask, g: (run("bwd", bwd, g, mask), jnp.zeros_like(mask)))

    def prop(x_padded, edge_mask=None):
        if edge_mask is None:
            return prop_plain(x_padded)
        return prop_masked(x_padded, edge_mask)

    return prop


class ShardedPropGraph:
    """Model-facing mesh-sharded propagation graph.

    Drop-in target for :func:`skrx.ops.graph.propagate`: ``prop(x (N, D),
    edge_mask=None)`` pads the node rows to the shard layout, runs the
    edge-partitioned propagate over the mesh (all axes by default), and
    slices back to (N, D). Built by ``models.common.build_prop_graph(adj,
    impl, mesh=...)`` so graph models shard their propagation — the
    reference's single hot path for this family
    (skrec/recommender/LightGCN.py:89-100) — just by passing their mesh.
    """

    def __init__(self, mesh, mat: Optional[sp.spmatrix] = None,
                 graph_impl: str = "auto", axis: Optional[AxisSpec] = None,
                 coo_edges=None, num_nodes: Optional[int] = None,
                 block_k: Optional[int] = None, window: Optional[int] = None):
        if axis is None:
            axis = tuple(mesh.axis_names)
        coo = _canonical_coo(coo_edges, mat)
        if coo is None:
            raise ValueError("ShardedPropGraph needs mat= or coo_edges=")
        if num_nodes is None:
            assert mat is not None and mat.shape[0] == mat.shape[1], \
                "pass num_nodes= for non-matrix edge lists"
            num_nodes = mat.shape[0]
        self.mesh = mesh
        self.axis = axis
        self.num_nodes = int(num_nodes)
        self.num_edges = len(coo[0])
        n_shards = _axis_size(mesh, axis)
        src, dst, w, _ = coo
        self.graph = sharded_graph_from_coo(src, dst, w, num_nodes, n_shards)
        impl = (graph_impl if graph_impl != "auto"
                else _resolve_local_impl(coo))
        self.local_impl = impl
        self._prop = make_sharded_propagate(
            mesh, self.graph, axis=axis, local_impl=impl, block_k=block_k,
            window=window, coo_edges=(src, dst, w))

    def prop(self, x: jnp.ndarray,
             edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pad = self.graph.padded_nodes - x.shape[0]
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        out = self._prop(xp, edge_mask)
        return out[:self.num_nodes] if pad else out
