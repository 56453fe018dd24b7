"""Graph kernels vs scipy/sklearn golden references."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.spatial import cKDTree
from sklearn.neighbors import NearestNeighbors

import jax.numpy as jnp


def _coords(n=500, seed=0, scale=1000.0):
    return np.random.default_rng(seed).uniform(0, scale, (n, 2)).astype(np.float32)


def test_knn_exact_matches_ckdtree():
    from spatialcore_tpu.ops import knn_exact

    coords = _coords(400)
    k = 8
    idx, dist = knn_exact(jnp.asarray(coords), k)
    idx, dist = np.asarray(idx), np.asarray(dist)

    tree = cKDTree(coords)
    ref_d, ref_i = tree.query(coords, k=k + 1)
    ref_d, ref_i = ref_d[:, 1:], ref_i[:, 1:]  # drop self

    np.testing.assert_allclose(dist, ref_d, rtol=1e-4, atol=1e-3)
    # index sets equal where distances are untied
    same = (np.sort(idx, axis=1) == np.sort(ref_i, axis=1)).mean()
    assert same > 0.999


def test_knn_exact_include_self():
    from spatialcore_tpu.ops import knn_exact

    coords = _coords(100)
    idx, dist = knn_exact(jnp.asarray(coords), 5, include_self=True)
    idx, dist = np.asarray(idx), np.asarray(dist)
    np.testing.assert_array_equal(idx[:, 0], np.arange(100))
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-5)


def test_knn_exact_nonmultiple_tile_sizes():
    from spatialcore_tpu.ops import knn_exact

    coords = _coords(333)
    idx, dist = knn_exact(jnp.asarray(coords), 4, tile_q=128, tile_c=100)
    ref_d, _ = cKDTree(coords).query(coords, k=5)
    np.testing.assert_allclose(np.asarray(dist), ref_d[:, 1:], rtol=1e-4, atol=1e-3)


def test_knn_grid_matches_exact():
    from spatialcore_tpu.ops import knn_grid

    coords = _coords(3000, seed=3)
    k = 10
    idx, dist = knn_grid(coords, k)
    ref_d, ref_i = cKDTree(coords).query(coords, k=k + 1)
    np.testing.assert_allclose(dist, ref_d[:, 1:], rtol=1e-4, atol=1e-3)
    same = (np.sort(idx, axis=1) == np.sort(ref_i[:, 1:], axis=1)).mean()
    assert same > 0.999


def test_knn_grid_clustered_density():
    from spatialcore_tpu.ops import knn_grid

    # two tight clusters + sparse background: stresses window expansion
    rng = np.random.default_rng(7)
    a = rng.normal(0, 1, (800, 2))
    b = rng.normal(50, 1, (800, 2))
    c = rng.uniform(-100, 150, (100, 2))
    coords = np.vstack([a, b, c]).astype(np.float32)
    idx, dist = knn_grid(coords, 6)
    ref_d, _ = cKDTree(coords).query(coords, k=7)
    np.testing.assert_allclose(dist, ref_d[:, 1:], rtol=1e-4, atol=1e-4)


def test_knn_grid_large_k_exact():
    """k larger than the default bucket target (auto-scaled capacity)."""
    from spatialcore_tpu.ops import knn_grid

    coords = _coords(3000, seed=9)
    k = 40
    idx, dist = knn_grid(coords, k)
    ref_d, ref_i = cKDTree(coords).query(coords, k=k + 1)
    np.testing.assert_allclose(dist, ref_d[:, 1:], rtol=1e-4, atol=1e-3)
    same = (np.sort(idx, axis=1) == np.sort(ref_i[:, 1:], axis=1)).mean()
    assert same > 0.999


def test_knn_grid_fallback_chunked():
    from spatialcore_tpu.ops import knn_grid

    # max_rounds=1 leaves the sparse-background cells unresolved after a
    # single window round, forcing the chunked exact-scan fallback;
    # fallback_chunk=7 exercises the chunk loop across uneven boundaries
    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.5, (900, 2))
    c = rng.uniform(-200, 200, (60, 2))
    coords = np.vstack([a, c]).astype(np.float32)
    idx, dist = knn_grid(coords, 6, max_rounds=1, fallback_chunk=7)
    ref_d, ref_i = cKDTree(coords).query(coords, k=7)
    np.testing.assert_allclose(dist, ref_d[:, 1:], rtol=1e-4, atol=1e-4)
    same = (np.sort(idx, axis=1) == np.sort(ref_i[:, 1:], axis=1)).mean()
    assert same > 0.999


def test_build_graph_rows_sum_to_one_and_match_sklearn():
    from spatialcore_tpu.ops import build_graph

    coords = _coords(300)
    g = build_graph(coords, n_neighbors=6)
    W = g.to_csr()
    np.testing.assert_allclose(np.asarray(W.sum(axis=1)).ravel(), 1.0, atol=1e-6)

    nn = NearestNeighbors(n_neighbors=7, algorithm="ball_tree").fit(coords)
    _, ref_i = nn.kneighbors(coords)
    ref_rows = np.repeat(np.arange(300), 6)
    ref = sp.csr_matrix((np.ones(300 * 6), (ref_rows, ref_i[:, 1:].ravel())),
                        shape=(300, 300))
    ref = ref.multiply(1.0 / ref.sum(axis=1))
    assert abs((W - ref).toarray()).max() < 1e-6


def test_build_graph_include_self():
    from spatialcore_tpu.ops import build_graph

    coords = _coords(100)
    g = build_graph(coords, n_neighbors=4, include_self=True)
    assert g.degree == 5
    W = g.to_csr()
    np.testing.assert_allclose(W.diagonal(), 0.2, atol=1e-6)


def test_radius_neighbors_and_overflow():
    from spatialcore_tpu.ops import build_graph, radius_neighbors

    coords = _coords(300, scale=100.0)
    idx, dist, valid = radius_neighbors(coords, radius=10.0, k_max=40)
    tree = cKDTree(coords)
    for i in [0, 17, 123]:
        ref = set(tree.query_ball_point(coords[i], 10.0)) - {i}
        got = set(np.asarray(idx[i])[np.asarray(valid[i])])
        assert got == ref

    with pytest.raises(ValueError, match="more than k_max"):
        radius_neighbors(coords, radius=50.0, k_max=5)

    g = build_graph(coords, radius=10.0, k_max=40)
    W = g.to_csr()
    rs = np.asarray(W.sum(axis=1)).ravel()
    assert ((np.abs(rs - 1) < 1e-6) | (rs == 0)).all()


def test_spatial_lag_matches_scipy():
    from spatialcore_tpu.ops import build_graph, spatial_lag

    coords = _coords(200)
    g = build_graph(coords, n_neighbors=6)
    Z = np.random.default_rng(1).normal(size=(200, 7)).astype(np.float32)
    lag = np.asarray(spatial_lag(g, jnp.asarray(Z)))
    ref = g.to_csr() @ Z
    np.testing.assert_allclose(lag, ref, rtol=1e-5, atol=1e-5)
    # 1-D variant
    lag1 = np.asarray(spatial_lag(g, jnp.asarray(Z[:, 0])))
    np.testing.assert_allclose(lag1, ref[:, 0], rtol=1e-5, atol=1e-5)


def test_graph_moments():
    from spatialcore_tpu.ops import build_graph, graph_moments

    coords = _coords(150)
    g = build_graph(coords, n_neighbors=5)
    m = graph_moments(g)
    # graph_moments accumulates in f64 (round 3) — oracle must too
    W = g.to_csr().astype(np.float64)
    assert abs(m["S0"] - W.sum()) < 1e-9
    sym = W + W.T
    assert abs(m["S1"] - 0.5 * sym.multiply(sym).sum()) < 1e-6
    row = np.asarray(W.sum(axis=1)).ravel()
    col = np.asarray(W.sum(axis=0)).ravel()
    assert abs(m["S2"] - ((row + col) ** 2).sum()) < 1e-4


def test_radius_exactly_kmax_neighbors_is_valid():
    """A cell with EXACTLY k_max in-radius neighbors is a complete,
    valid result — the overflow check must not false-positive on it."""
    from spatialcore_tpu.ops.graph import radius_neighbors

    # 1 center + k_max points on a circle of radius 1, all within
    # radius=1.5 of the center; points on the circle are ~1.56+ apart
    # for k_max=4 (square: side sqrt(2)≈1.41 < 1.5 — use k_max=4 with
    # neighbors among themselves too). Simpler: center + 4 points at
    # distance 1; radius 1.2 → center has exactly 4 in-radius.
    k_max = 4
    ang = np.linspace(0, 2 * np.pi, k_max, endpoint=False)
    pts = np.concatenate([[[0.0, 0.0]],
                          np.stack([np.cos(ang), np.sin(ang)], 1)])
    idx, dist, valid = radius_neighbors(
        pts.astype(np.float32), radius=1.2, k_max=k_max)
    # center: exactly k_max neighbors in radius, no error raised
    assert int(np.asarray(valid)[0].sum()) == k_max
    # a genuinely overflowing cap still raises
    with pytest.raises(ValueError, match="more than k_max"):
        radius_neighbors(pts.astype(np.float32), radius=1.2, k_max=3)


def test_stored_graph_mismatch_guards():
    """Cached graphs from different coordinates or self-loop conventions
    must be rebuilt, not silently reused (radius graphs included)."""
    import spatialcore_tpu as sct
    from spatialcore_tpu.spatial.autocorrelation import _get_graph

    rng = np.random.default_rng(0)
    n = 300
    a = sct.SpatialData(X=sp.csr_matrix(
        rng.poisson(1, (n, 4)).astype(np.float32)))
    a.obsm["spatial"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    a.obsm["spatial_alt"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)

    # radius graph stored under spatial_alt: requesting 'spatial' rebuilds
    sct.spatial.build_spatial_weights(a, radius=15.0, k_max=64,
                                      spatial_key="spatial_alt")
    g = _get_graph(a, n_neighbors=6, spatial_key="spatial",
                   use_existing_graph=True)
    assert g.neighbor_idx.shape[1] == 6  # rebuilt as kNN-6, not reused

    # include_self=True stored graph: default request rebuilds
    sct.spatial.build_spatial_weights(a, n_neighbors=6, include_self=True)
    g2 = _get_graph(a, n_neighbors=6, spatial_key="spatial",
                    use_existing_graph=True)
    own = np.asarray(g2.neighbor_idx) == np.arange(n)[:, None]
    assert not own.any()  # no self-loops in the graph actually used


def test_dense_expression_layer_fallback_raises():
    """Plain-anndata fallback must not silently drop the layer arg."""
    from spatialcore_tpu.spatial.autocorrelation import _dense_expression

    class FakeAnnData:  # no get_matrix, like anndata.AnnData
        pass

    import pandas as pd
    fa = FakeAnnData()
    fa.X = np.ones((5, 2), np.float32)
    fa.layers = {"lognorm": np.full((5, 2), 2.0, np.float32)}
    fa.var_names = pd.Index(["A", "B"])
    out = _dense_expression(fa, ["A"], layer="lognorm")
    assert (out == 2.0).all()  # the LAYER, not X
    with pytest.raises(ValueError, match="Layer 'nope' not found"):
        _dense_expression(fa, ["A"], layer="nope")
