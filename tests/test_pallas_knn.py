"""Pallas kNN kernel: exactness vs brute force (interpret mode on CPU)."""

import numpy as np
import pytest

from spatialcore_tpu.ops import build_graph, pallas_knn


def _brute(coords, k, include_self=False):
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    if not include_self:
        np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :k]


def test_pallas_knn_exact_vs_bruteforce():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 100, (700, 2)).astype(np.float32)
    idx, dist = pallas_knn(coords, 6)
    idx, dist = np.asarray(idx), np.asarray(dist)
    want = _brute(coords, 6)
    np.testing.assert_allclose(np.sort(dist ** 2, axis=1), want, rtol=1e-3,
                               atol=1e-5)
    # neighbor id sets match brute-force argsort sets
    order = np.argsort(((coords[:, None, :] - coords[None, :, :]) ** 2)
                       .sum(-1) + np.eye(700) * 1e18, axis=1)[:, :6]
    same = [set(idx[i]) == set(order[i]) for i in range(0, 700, 37)]
    assert np.mean(same) > 0.95  # ties at f32 may swap boundary neighbors


def test_pallas_knn_include_self_and_validation():
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 50, (300, 2)).astype(np.float32)
    idx, dist = pallas_knn(coords, 4, include_self=True)
    idx, dist = np.asarray(idx), np.asarray(dist)
    assert (idx[:, 0] == np.arange(300)).all()
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-3)
    with pytest.raises(ValueError, match="2D"):
        pallas_knn(np.zeros((10, 3), np.float32), 2)
    with pytest.raises(ValueError, match="k="):
        pallas_knn(coords, 300)


def test_build_graph_pallas_backend_matches_default():
    rng = np.random.default_rng(2)
    coords = rng.uniform(0, 200, (400, 2)).astype(np.float32)
    g1 = build_graph(coords, n_neighbors=5)
    g2 = build_graph(coords, n_neighbors=5, method="pallas")
    same = (np.sort(np.asarray(g1.neighbor_idx), axis=1)
            == np.sort(np.asarray(g2.neighbor_idx), axis=1))
    assert same.mean() > 0.99
