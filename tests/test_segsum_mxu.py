"""MXU propagation kernel (skrx/ops/pallas/segsum_mxu.py): equivalence with
the segment-sum path, transpose backward, edge masks, and the propagate()
dispatch. Runs in interpret mode on the CPU mesh; SKRX_TEST_TPU=1 exercises
the compiled kernel."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import scipy.sparse as sp

from skrx.ops.graph import graph_from_sp_matrix, propagate, propagate_layers
from skrx.ops.pallas.segsum_mxu import (mxu_graph_from_coo,
                                        mxu_graph_from_sp_matrix,
                                        propagate_mxu)


def _random_sparse(n, density, seed):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, n)) < density) * rng.random((n, n))
    return sp.csr_matrix(dense.astype(np.float32))


@pytest.mark.parametrize("seed,block_k,window", [(0, 64, 16), (1, 32, 32)])
def test_matches_spmm_and_transpose_grad(seed, block_k, window):
    rng = np.random.default_rng(seed)
    n, d = 150, 8
    mat = _random_sparse(n, 0.06, seed)
    g = mxu_graph_from_sp_matrix(mat, block_k=block_k, window=window)
    x = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(propagate_mxu(g, jnp.asarray(x)))
    np.testing.assert_allclose(out, mat @ x, rtol=1e-4, atol=1e-5)

    ct = rng.standard_normal((n, d)).astype(np.float32)
    grad = jax.grad(lambda xx: jnp.sum(propagate_mxu(g, xx)
                                       * jnp.asarray(ct)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), mat.T @ ct, rtol=1e-4,
                               atol=1e-5)


def test_edge_mask_matches_segment_path():
    rng = np.random.default_rng(2)
    n, d = 120, 8
    mat = _random_sparse(n, 0.08, 2)
    seg = graph_from_sp_matrix(mat)
    mxu = mxu_graph_from_sp_matrix(mat, block_k=64, window=16)
    # both lower edges in CSR order, so one mask addresses the same edges
    mask = (rng.random(mat.nnz) > 0.3).astype(np.float32) / 0.7
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    out_seg = np.asarray(propagate(seg, x, jnp.asarray(mask)))
    out_mxu = np.asarray(propagate(mxu, x, jnp.asarray(mask)))
    np.testing.assert_allclose(out_mxu, out_seg, rtol=1e-4, atol=1e-5)

    # masked gradient also flows through A^T with the same mask
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    g_seg = jax.grad(lambda xx: jnp.sum(propagate(seg, xx, jnp.asarray(mask))
                                        * ct))(x)
    g_mxu = jax.grad(lambda xx: jnp.sum(propagate(mxu, xx, jnp.asarray(mask))
                                        * ct))(x)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_seg),
                               rtol=1e-4, atol=1e-5)


def test_propagate_layers_dispatch_and_jit():
    rng = np.random.default_rng(3)
    n, d = 100, 8
    mat = _random_sparse(n, 0.07, 3)
    seg = graph_from_sp_matrix(mat)
    mxu = mxu_graph_from_sp_matrix(mat, block_k=64, window=16)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    @jax.jit
    def f_mxu(x):
        return propagate_layers(mxu, x, num_layers=3, combine="mean")

    out_seg = np.asarray(propagate_layers(seg, x, num_layers=3,
                                          combine="mean"))
    np.testing.assert_allclose(np.asarray(f_mxu(x)), out_seg, rtol=1e-4,
                               atol=1e-5)


def test_isolated_nodes_and_empty_windows():
    # single edge 0 -> 1 weight 2; many empty windows must still zero out
    mat = sp.csr_matrix((np.array([2.0], np.float32),
                         (np.array([0]), np.array([1]))), shape=(100, 100))
    g = mxu_graph_from_sp_matrix(mat, block_k=32, window=16)
    out = np.asarray(propagate_mxu(g, jnp.ones((100, 4))))
    expected = np.zeros((100, 4))
    expected[0] = 2.0
    np.testing.assert_allclose(out, expected)


def test_bf16_messages_close():
    rng = np.random.default_rng(4)
    n, d = 128, 16
    mat = _random_sparse(n, 0.1, 4)
    g = mxu_graph_from_sp_matrix(mat, block_k=64, window=32,
                                 msg_dtype=jnp.bfloat16)
    x = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(propagate_mxu(g, jnp.asarray(x)))
    ref = mat @ x
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / denom < 2e-2


def test_high_degree_node_spans_chunks():
    # hub node receives 300 edges > block_k: accumulation across chunks
    n, k = 400, 300
    rows = np.zeros(k, dtype=np.int64)          # all edges point at node 0
    cols = np.arange(1, k + 1, dtype=np.int64)
    w = np.full(k, 0.5, np.float32)
    g = mxu_graph_from_coo(cols, rows, w, n, block_k=64, window=16)
    x = jnp.ones((n, 8))
    out = np.asarray(propagate_mxu(g, x))
    assert np.allclose(out[0], 0.5 * k)
    assert np.allclose(out[1:], 0.0)


def test_lightgcn_mxu_impl_matches_segment(tmp_path, monkeypatch):
    """End-to-end: LightGCN trained with graph_impl='mxu' (interpret-mode
    kernel on CPU) reproduces the segment-path metrics exactly at f32."""
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.LightGCN import LightGCN

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=7, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender="LightGCN", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, reg=0.001, embed_size=16, n_layers=2,
                  batch_size=256, epochs=2, early_stop=2)
    res_seg = LightGCN(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = LightGCN(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_rectangular_operator_and_transpose():
    """R (m x n) forward, transpose view, and gradients."""
    from skrx.ops.pallas.segsum_mxu import transpose_mxu_graph

    rng = np.random.default_rng(6)
    m, n, d, e = 90, 140, 8, 600
    rows = rng.integers(0, m, e)
    cols = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    R = sp.coo_matrix((w, (rows, cols)), shape=(m, n)).tocsr()
    g = mxu_graph_from_coo(cols, rows, w, m, block_k=64, window=16,
                           num_src_nodes=n)
    x_i = rng.standard_normal((n, d)).astype(np.float32)
    out = np.asarray(propagate_mxu(g, jnp.asarray(x_i)))
    np.testing.assert_allclose(out, R @ x_i, rtol=1e-4, atol=1e-5)

    gt = transpose_mxu_graph(g)
    x_u = rng.standard_normal((m, d)).astype(np.float32)
    out_t = np.asarray(propagate_mxu(gt, jnp.asarray(x_u)))
    np.testing.assert_allclose(out_t, R.T @ x_u, rtol=1e-4, atol=1e-5)

    ct = rng.standard_normal((m, d)).astype(np.float32)
    grad = jax.grad(lambda xx: jnp.sum(propagate_mxu(g, xx)
                                       * jnp.asarray(ct)))(jnp.asarray(x_i))
    np.testing.assert_allclose(np.asarray(grad), R.T @ ct, rtol=1e-4,
                               atol=1e-5)


def test_lightgcl_mxu_impl_matches_segment(tmp_path, monkeypatch):
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.LightGCL import LightGCL

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=9, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender="LightGCL", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, d=16, gnn_layer=2, svd_q=4, batch_size=256,
                  epochs=2, early_stop=2, dropout=0.2)
    res_seg = LightGCL(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = LightGCL(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_layergcn_mxu_impl_matches_segment(tmp_path, monkeypatch):
    """LayerGCN's per-epoch pruning reformulated as an edge mask on the
    static MXU graph reproduces the dynamic-edge segment path."""
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.LayerGCN import LayerGCN

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=8, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender="LayerGCN", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, reg=0.001, embed_dim=16, n_layers=2, dropout=0.3,
                  batch_size=256, epochs=3, early_stop=3)
    res_seg = LayerGCN(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = LayerGCN(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_masked_edges_block_nonfinite_rows():
    """Zero-weight (masked) edges must contribute exact zeros even when the
    gathered source row is NaN/inf — edge-removal semantics (the segment
    path never reads removed rows; 0 * NaN would otherwise leak)."""
    mat = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]], np.float32))
    g = mxu_graph_from_sp_matrix(mat, block_k=8, window=8)
    x = jnp.asarray(np.array([[np.nan, np.inf], [1.0, 2.0]], np.float32))
    mask = jnp.asarray(np.array([1.0, 0.0], np.float32))  # drop edge from row0
    out = np.asarray(propagate_mxu(g, x, mask))
    # CSR edge order: (0 <- 1) then (1 <- 0); mask keeps only the first
    np.testing.assert_allclose(out, [[1.0, 2.0], [0.0, 0.0]])


def test_freedom_mxu_impl_matches_segment(tmp_path, monkeypatch):
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.FREEDOM import FREEDOM

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=10, with_mm=True, img_dim=12,
                                          txt_dim=10)
    rc = RunConfig(recommender="FREEDOM", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, embed_dim=16, feat_dim=16, knn_k=5, dropout=0.6,
                  n_mm_layers=1, n_ui_layers=2, batch_size=256, epochs=2,
                  early_stop=2)
    res_seg = FREEDOM(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = FREEDOM(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_mgcn_mxu_impl_matches_segment(tmp_path, monkeypatch):
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.MGCN import MGCN

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=12, with_mm=True, img_dim=12,
                                          txt_dim=10)
    rc = RunConfig(recommender="MGCN", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, embed_dim=16, n_ui_layers=2, n_layers=1, knn_k=5,
                  batch_size=256, epochs=2, early_stop=2)
    res_seg = MGCN(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = MGCN(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_mxu_bf16_impl_trains_close(tmp_path, monkeypatch):
    """graph_impl='mxu_bf16' (halved message traffic) trains to metrics close
    to the f32 paths (bf16 feature rounding, larger drift allowed)."""
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.LightGCN import LightGCN

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=7, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender="LightGCN", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, reg=0.001, embed_size=16, n_layers=2,
                  batch_size=256, epochs=2, early_stop=2)
    res_seg = LightGCN(rc, dict(params, graph_impl="segment")).fit()
    res_bf = LightGCN(rc, dict(params, graph_impl="mxu_bf16")).fit()
    assert np.isfinite(res_bf["NDCG@10"])
    np.testing.assert_allclose(res_bf["NDCG@10"], res_seg["NDCG@10"],
                               rtol=0.1)


def test_weighted_propagate_and_weight_grad():
    """propagate_mxu_weighted: traced weights, gradients in both x and w
    match the segment formulation."""
    from skrx.ops.pallas.segsum_mxu import (propagate_mxu_weighted,
                                            weighted_mxu_graph_from_coo)

    rng = np.random.default_rng(5)
    n, d, e = 130, 8, 700
    src = rng.integers(0, n, e)
    dst = np.sort(rng.integers(0, n, e))
    g = weighted_mxu_graph_from_coo(src, dst, n, block_k=64, window=16)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def seg(xx, ww):
        return jax.ops.segment_sum(xx[jnp.asarray(src)] * ww[:, None],
                                   jnp.asarray(dst), num_segments=n,
                                   indices_are_sorted=True)

    out = propagate_mxu_weighted(g, x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seg(x, w)),
                               rtol=1e-4, atol=1e-5)

    def loss_mxu(xx, ww):
        return jnp.sum(propagate_mxu_weighted(g, xx, ww) * ct)

    def loss_seg(xx, ww):
        return jnp.sum(seg(xx, ww) * ct)

    gx_m, gw_m = jax.grad(loss_mxu, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(loss_seg, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_s), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_m), np.asarray(gw_s), rtol=1e-4,
                               atol=1e-5)


def test_sgat_mxu_impl_matches_segment(tmp_path, monkeypatch):
    from skrx import RunConfig
    from skrx.io import synthetic
    from skrx.models.SGAT import SGAT

    monkeypatch.chdir(tmp_path)
    data_dir = synthetic.make_dataset_dir(str(tmp_path), num_users=40,
                                          num_items=60, num_ratings=900,
                                          seed=14, latent_dim=4,
                                          latent_strength=6.0)
    rc = RunConfig(recommender="SGAT", data_dir=data_dir,
                   file_column="UIRT", sep="\t", metric=("Recall", "NDCG"),
                   top_k=(10,), test_batch_size=32, seed=2021)
    params = dict(lr=0.01, reg=0.001, n_layers=2, n_seqs=4, n_next=2,
                  embed_size=16, batch_size=256, epochs=2, early_stop=2)
    res_seg = SGAT(rc, dict(params, graph_impl="segment")).fit()
    res_mxu = SGAT(rc, dict(params, graph_impl="mxu")).fit()
    assert np.isfinite(res_mxu["NDCG@10"])
    np.testing.assert_allclose(res_mxu["NDCG@10"], res_seg["NDCG@10"],
                               rtol=2e-3)


def test_empty_edge_graph_is_zero_operator():
    g = mxu_graph_from_coo(np.array([], np.int64), np.array([], np.int64),
                           np.array([], np.float32), 50, block_k=16,
                           window=16)
    out = np.asarray(propagate_mxu(g, jnp.ones((50, 4))))
    np.testing.assert_array_equal(out, np.zeros((50, 4)))


def test_autotune_pick_and_default_wiring():
    from skrx.ops.pallas.autotune import (DEFAULT_BLOCK_K, DEFAULT_WINDOW,
                                          pick_block_sizes)
    # nearest measured winner; window=128 everywhere on v5e
    assert pick_block_sizes(100_000, 64) == (512, 128)
    assert pick_block_sizes(2_000_000, 64) == (1024, 128)
    assert pick_block_sizes(8_000_000, 64) == (512, 128)
    assert DEFAULT_WINDOW == 128 and DEFAULT_BLOCK_K == 512

    # default-arg graph build resolves via the autotune table and matches
    # the explicitly-built graph numerically
    mat = _random_sparse(90, 0.08, 3)
    x = np.random.default_rng(3).standard_normal((90, 8)).astype(np.float32)
    g_auto = mxu_graph_from_sp_matrix(mat)
    bk, win = pick_block_sizes(mat.nnz, 8)
    assert (g_auto.fwd.block_k, g_auto.fwd.window) == (bk, win)
    g_exp = mxu_graph_from_sp_matrix(mat, block_k=bk, window=win)
    np.testing.assert_allclose(
        np.asarray(propagate_mxu(g_auto, jnp.asarray(x))),
        np.asarray(propagate_mxu(g_exp, jnp.asarray(x))), rtol=1e-6)
