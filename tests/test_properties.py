"""Property tests (SURVEY.md §4): invariants that must hold for any input."""

import jax
import jax.numpy as jnp
import numpy as np

from spatialcore_tpu.core.rng import batch_permutations, key_for
from spatialcore_tpu.ops.graph import build_graph
from spatialcore_tpu.ops.moran import (
    classify_quadrants, geary_observed, moran_observed, standardize)


def test_weights_rows_sum_to_one():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 100, (500, 2)).astype(np.float32)
    g = build_graph(coords, n_neighbors=7)
    np.testing.assert_allclose(np.asarray(g.neighbor_w).sum(axis=1), 1.0,
                               rtol=1e-6)
    # radius mode: rows with any neighbor sum to 1, isolated rows to 0
    g2 = build_graph(coords, radius=3.0, k_max=32)
    sums = np.asarray(g2.neighbor_w).sum(axis=1)
    has = np.asarray(g2.valid).any(axis=1)
    np.testing.assert_allclose(sums[has], 1.0, rtol=1e-6)
    np.testing.assert_allclose(sums[~has], 0.0)


def test_quadrants_exhaustive_and_consistent():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((400, 3)).astype(np.float32))
    lag = jnp.asarray(rng.standard_normal((400, 3)).astype(np.float32))
    p = jnp.asarray(rng.uniform(size=(400, 3)).astype(np.float32))
    q = np.asarray(classify_quadrants(z, lag, p, alpha=0.05))
    assert set(np.unique(q)).issubset({0, 1, 2, 3, 4})
    zn, ln, pn = np.asarray(z), np.asarray(lag), np.asarray(p)
    sig = pn < 0.05
    assert (q[~sig] == 0).all()
    hh = sig & (zn > 0) & (ln > 0)
    assert (q[hh] == 1).all()
    lh = sig & (zn < 0) & (ln > 0)
    assert (q[lh] == 4).all()


def test_global_stats_invariant_under_cell_relabeling():
    """Relabeling cells (and the graph with them) must not change I or C."""
    rng = np.random.default_rng(2)
    n = 600
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    X = rng.standard_normal((n, 4)).astype(np.float32)
    X[:, 0] += np.sin(coords[:, 0] / 10)

    g = build_graph(coords, n_neighbors=6)
    Z, _ = standardize(jnp.asarray(X))
    I0 = np.asarray(moran_observed(g, Z, float(n)))
    C0 = np.asarray(geary_observed(g, Z, float(n)))

    perm = rng.permutation(n)
    g2 = build_graph(coords[perm], n_neighbors=6)
    Z2, _ = standardize(jnp.asarray(X[perm]))
    I1 = np.asarray(moran_observed(g2, Z2, float(n)))
    C1 = np.asarray(geary_observed(g2, Z2, float(n)))
    np.testing.assert_allclose(I0, I1, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(C0, C1, rtol=2e-4, atol=1e-6)


def test_batch_permutations_are_permutations():
    P = np.asarray(batch_permutations(seed=0, n=257, n_permutations=8))
    for row in P:
        assert sorted(row.tolist()) == list(range(257))
    assert len({tuple(r) for r in P}) == 8  # distinct draws


def test_key_for_stability_regression():
    """Counter-based keys must never change across refactors — results
    (permutation p-values) are keyed on them."""
    k1 = jax.random.key_data(key_for(0, "perm_global", 0))
    k2 = jax.random.key_data(key_for(0, "perm_global", 0))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    k3 = jax.random.key_data(key_for(1, "perm_global", 0))
    assert not np.array_equal(np.asarray(k1), np.asarray(k3))
    # a draw derived from the documented scheme stays stable
    perm = np.asarray(jax.random.permutation(
        jax.random.fold_in(key_for(0, "perm_global", 0), 0), 16))
    assert sorted(perm.tolist()) == list(range(16))


def test_standardize_properties():
    rng = np.random.default_rng(3)
    X = rng.normal(5.0, 2.0, (300, 5)).astype(np.float32)
    X[:, 2] = 7.0  # zero-variance column
    Z, zero = standardize(jnp.asarray(X))
    Z = np.asarray(Z)
    assert np.asarray(zero).tolist() == [False, False, True, False, False]
    np.testing.assert_allclose(Z.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(Z[:, [0, 1, 3, 4]].std(axis=0), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(Z[:, 2], 0.0, atol=1e-6)
