"""Independent analytic oracles for the autocorrelation estimators.

These are closed-form mathematical identities — not reimplementations of
the kernels — so they check the estimator conventions against something no
shared author bias can touch (SURVEY.md §7 hard part 1; esda/squidpy are
not installable in this environment, so exact lattice/eigenvector identities
stand in as the independent reference):

1. Ring lattice (cycle graph), neighbors ±1, row-normalized: the weight
   matrix is circulant, its eigenvectors are the Fourier modes. For
   z_i = cos(2π m i / n), the spatial lag is exactly cos(2π m / n) · z, so
   Moran's I = (n/S0) · zᵀ(Wz)/zᵀz = cos(2π m / n) exactly.
2. Same setting, Geary's C = (n−1)/n · (1 − cos(2π m / n)) exactly:
   Σ_ij w_ij (z_i − z_j)² = 2 zᵀz − 2 zᵀWz (row-stochastic symmetric W).
3. Checkerboard on the ring (m = n/2): I = −1, C = 2(n−1)/n.
4. Expected I under permutation = −1/(n−1): verified against the
   analytic-moments code AND the empirical permutation mean.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spatialcore_tpu.ops.graph import SpatialGraph
from spatialcore_tpu.ops.moran import (
    geary_observed, moran_analytic_moments, moran_observed,
    permutation_test_global, standardize)


def ring_graph(n: int) -> SpatialGraph:
    left = (np.arange(n) - 1) % n
    right = (np.arange(n) + 1) % n
    idx = np.stack([left, right], axis=1).astype(np.int32)
    w = np.full((n, 2), 0.5, np.float32)
    return SpatialGraph(
        neighbor_idx=jnp.asarray(idx), neighbor_w=jnp.asarray(w),
        valid=jnp.ones((n, 2), bool), distances=jnp.ones((n, 2), jnp.float32))


@pytest.mark.parametrize("n,m", [(360, 1), (360, 5), (1000, 3), (64, 32)])
def test_moran_ring_eigenmode_exact(n, m):
    graph = ring_graph(n)
    i = np.arange(n)
    z = np.cos(2 * np.pi * m * i / n).astype(np.float64)
    z = (z - z.mean()) / z.std()
    I = moran_observed(graph, jnp.asarray(z[:, None], jnp.float32),
                       S0=float(n))
    expected = np.cos(2 * np.pi * m / n)  # exact eigenvalue of W
    np.testing.assert_allclose(float(I[0]), expected, atol=2e-6)


@pytest.mark.parametrize("n,m", [(360, 1), (360, 5), (64, 32)])
def test_geary_ring_eigenmode_exact(n, m):
    graph = ring_graph(n)
    i = np.arange(n)
    z = np.cos(2 * np.pi * m * i / n)
    Z, _ = standardize(jnp.asarray(z[:, None], jnp.float32))
    C = geary_observed(graph, Z, S0=float(n))
    expected = (n - 1) / n * (1.0 - np.cos(2 * np.pi * m / n))
    np.testing.assert_allclose(float(C[0]), expected, atol=2e-6)


def test_checkerboard_extremes():
    n = 64
    graph = ring_graph(n)
    z = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    Z, _ = standardize(jnp.asarray(z[:, None], jnp.float32))
    I = moran_observed(graph, Z, S0=float(n))
    C = geary_observed(graph, Z, S0=float(n))
    np.testing.assert_allclose(float(I[0]), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(C[0]), 2 * (n - 1) / n, atol=1e-6)


def test_expected_I_under_permutation():
    n = 200
    graph = ring_graph(n)
    rng = np.random.default_rng(0)
    Z, _ = standardize(jnp.asarray(rng.normal(0, 1, (n, 4)), jnp.float32))
    EI, _ = moran_analytic_moments(Z, S0=float(n), S1=float(n), S2=float(4 * n))
    np.testing.assert_allclose(EI, -1.0 / (n - 1), rtol=1e-12)
    obs = moran_observed(graph, Z, S0=float(n))
    _, mean, _ = permutation_test_global(
        graph, Z, S0=float(n), observed=obs, seed=0, n_permutations=999)
    # empirical null mean ~ -1/(n-1) within Monte-Carlo error
    np.testing.assert_allclose(np.asarray(mean), -1.0 / (n - 1), atol=6e-3)


def test_grid_rook_checkerboard():
    """2D rook-lattice checkerboard: every neighbor differs => I = -1."""
    s = 12
    n = s * s
    yy, xx = np.divmod(np.arange(n), s)
    nbrs = []
    for i in range(n):
        y, x = yy[i], xx[i]
        cand = []
        if x > 0: cand.append(i - 1)
        if x < s - 1: cand.append(i + 1)
        if y > 0: cand.append(i - s)
        if y < s - 1: cand.append(i + s)
        nbrs.append(cand)
    k = 4
    idx = np.zeros((n, k), np.int32)
    w = np.zeros((n, k), np.float32)
    valid = np.zeros((n, k), bool)
    for i, cand in enumerate(nbrs):
        for j, c in enumerate(cand):
            idx[i, j] = c
            valid[i, j] = True
        w[i, :len(cand)] = 1.0 / len(cand)
    graph = SpatialGraph(jnp.asarray(idx), jnp.asarray(w),
                         jnp.asarray(valid), jnp.full((n, k), 1.0))
    z = np.where((xx + yy) % 2 == 0, 1.0, -1.0)
    Z, _ = standardize(jnp.asarray(z[:, None], jnp.float32))
    I = moran_observed(graph, Z, S0=float(n))
    np.testing.assert_allclose(float(I[0]), -1.0, atol=1e-6)
