"""Sharded propagation (skrx/parallel/graph_shard.py) on the virtual
8-device CPU mesh: equivalence with single-device propagate, gradients
through the all-gather/reduce-scatter pair, and a sharded LightGCN-style
train step."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import scipy.sparse as sp

from skrx.ops.graph import graph_from_sp_matrix, propagate
from skrx.parallel import (make_mesh, make_sharded_propagate, pad_rows,
                           sharded_graph_from_sp_matrix, unpad_rows)
from jax.sharding import NamedSharding, PartitionSpec as P


def _random_sparse(n, density, seed):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density) * rng.random((n, n))
    return sp.csr_matrix(dense.astype(np.float32))


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return make_mesh()  # all devices on the data axis


def test_sharded_propagate_matches_single(mesh):
    n, d = 230, 16
    mat = _random_sparse(n, 0.05, 0)
    seg = graph_from_sp_matrix(mat)
    sg = sharded_graph_from_sp_matrix(mat, mesh.shape["data"])
    prop = make_sharded_propagate(mesh, sg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, d))
                    .astype(np.float32))
    xp = jax.device_put(pad_rows(x, sg), NamedSharding(mesh, P("data", None)))
    out = unpad_rows(prop(xp), sg)
    ref = propagate(seg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_propagate_grad(mesh):
    n, d = 150, 8
    mat = _random_sparse(n, 0.06, 2)
    sg = sharded_graph_from_sp_matrix(mat, mesh.shape["data"])
    prop = make_sharded_propagate(mesh, sg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ct_p = pad_rows(ct, sg)

    @jax.jit
    def loss(xp):
        return jnp.sum(prop(xp) * ct_p)

    xp = jax.device_put(pad_rows(x, sg), NamedSharding(mesh, P("data", None)))
    g = unpad_rows(jax.grad(loss)(xp), sg)
    ref = sp.csr_matrix(mat).T @ np.asarray(ct)
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-4, atol=1e-5)


def test_sharded_lightgcn_train_step(mesh):
    """Full sharded LightGCN-style step: 2-layer propagation + BPR + Adam,
    features row-sharded, batch replicated; one step stays finite and
    matches the single-device step's loss."""
    import optax
    from skrx.ops.losses import bpr_loss

    U, I, d = 60, 90, 8
    n = U + I
    rng = np.random.default_rng(4)
    pairs = np.stack([rng.integers(0, U, 400),
                      rng.integers(0, I, 400)], 1)
    from skrx.models.LightGCN import build_bipartite_adj
    adj = build_bipartite_adj(pairs.astype(np.int64), U, I, "pre")
    sg = sharded_graph_from_sp_matrix(adj, mesh.shape["data"])
    prop = make_sharded_propagate(mesh, sg)
    seg = graph_from_sp_matrix(adj)

    x0 = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    users = jnp.asarray(rng.integers(0, U, 32, dtype=np.int32))
    pos = jnp.asarray((rng.integers(0, I, 32) + U).astype(np.int32))
    neg = jnp.asarray((rng.integers(0, I, 32) + U).astype(np.int32))

    def make_loss(prop_fn, pad, unpad):
        def loss_fn(xp):
            h = xp
            total = xp
            for _ in range(2):
                h = prop_fn(h)
                total = total + h
            comb = unpad(total / 3.0)
            y_pos = jnp.sum(comb[users] * comb[pos], -1)
            y_neg = jnp.sum(comb[users] * comb[neg], -1)
            return jnp.mean(bpr_loss(y_pos, y_neg))
        return loss_fn

    # sharded
    xp = jax.device_put(pad_rows(jnp.asarray(x0), sg),
                        NamedSharding(mesh, P("data", None)))
    loss_sharded = make_loss(prop, None, lambda a: unpad_rows(a, sg))
    opt = optax.adam(1e-2)

    @jax.jit
    def step(xp, s):
        l, g = jax.value_and_grad(loss_sharded)(xp)
        upd, s = opt.update(g, s)
        return optax.apply_updates(xp, upd), s, l

    xp2, _, l_sh = step(xp, opt.init(xp))
    # single-device reference
    loss_single = make_loss(lambda h: propagate(seg, h), None, lambda a: a)
    l_ref = loss_single(jnp.asarray(x0))
    assert np.isfinite(float(l_sh))
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    assert bool(jnp.isfinite(xp2).all())


def test_sharded_graph_padding_keeps_indices_sorted():
    """Padding dst_local entries must keep each shard's index stream sorted
    (rows_per - 1 fill), or the segment_sum sortedness hint is a lie on TPU."""
    mat = _random_sparse(100, 0.03, 5)
    sg = sharded_graph_from_sp_matrix(mat, 4)
    dstl = np.asarray(sg.dst_local)
    for s in range(4):
        assert (np.diff(dstl[s]) >= 0).all(), f"shard {s} indices unsorted"


def test_sharded_graph_empty_adjacency():
    mat = sp.csr_matrix((40, 40), dtype=np.float32)
    sg = sharded_graph_from_sp_matrix(mat, 4)
    assert np.asarray(sg.weight).sum() == 0.0


def test_mesh_shard_mismatch_raises(mesh):
    mat = _random_sparse(60, 0.05, 6)
    sg = sharded_graph_from_sp_matrix(mat, mesh.shape["data"] + 1)
    with pytest.raises(ValueError, match="partitioned for"):
        make_sharded_propagate(mesh, sg)


def test_sharded_masked_edges_block_nonfinite(mesh):
    """Zero-weight padding edges contribute exact zeros even when the
    gathered feature row is non-finite (0 * NaN leak guard, matching the
    MXU kernel's edge-removal semantics)."""
    n = 64
    # one real edge per shard region, so every shard has padding slots
    rows = np.array([0, 63], np.int64)
    cols = np.array([1, 2], np.int64)
    w = np.ones(2, np.float32)
    mat = sp.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    sg = sharded_graph_from_sp_matrix(mat, mesh.shape["data"])
    prop = make_sharded_propagate(mesh, sg)
    x = np.ones((n, 4), np.float32)
    x[0] = np.nan  # padding edges gather row 0 in some shards
    xp = jax.device_put(pad_rows(jnp.asarray(x), sg),
                        NamedSharding(mesh, P("data", None)))
    out = unpad_rows(prop(xp), sg)
    out = np.asarray(out)
    assert np.isfinite(out[1:]).all()
    np.testing.assert_allclose(out[0], 1.0)   # 0 <- 1 edge, finite source
    np.testing.assert_allclose(out[63], 1.0)  # 63 <- 2 edge


def test_sharded_propagate_mxu_local_matches(mesh):
    """local_impl='mxu' (per-shard Pallas kernel under shard_map, custom
    sharded VJP over the transpose partition) matches the segment path."""
    n, d = 140, 8
    mat = _random_sparse(n, 0.05, 7)
    sg = sharded_graph_from_sp_matrix(mat, mesh.shape["data"])
    prop_seg = make_sharded_propagate(mesh, sg)
    prop_mxu = make_sharded_propagate(mesh, sg, local_impl="mxu",
                                      block_k=32, window=8, sp_matrix=mat)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    xp = jax.device_put(pad_rows(x, sg), NamedSharding(mesh, P("data", None)))
    out_seg = np.asarray(unpad_rows(prop_seg(xp), sg))
    out_mxu = np.asarray(unpad_rows(prop_mxu(xp), sg))
    np.testing.assert_allclose(out_mxu, out_seg, rtol=1e-5, atol=1e-6)

    ct = pad_rows(jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)),
                  sg)
    g_seg = jax.grad(lambda a: jnp.sum(prop_seg(a) * ct))(xp)
    g_mxu = jax.grad(lambda a: jnp.sum(prop_mxu(a) * ct))(xp)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_seg),
                               rtol=1e-4, atol=1e-5)
