"""Banded permutation-null kernel: correctness vs dense oracle and legacy path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialcore_tpu.ops.banded import (
    NullPlan, banded_permutation_test, build_null_plan, hilbert_order)
from spatialcore_tpu.ops.graph import build_graph
from spatialcore_tpu.ops.moran import (
    geary_observed, moran_observed, permutation_test_global, standardize)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n, g = 800, 12
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    # spatially structured + noise columns
    X = np.stack(
        [np.sin(coords[:, 0] / 9.0) + rng.normal(0, 0.3, n) for _ in range(g // 2)]
        + [rng.normal(0, 1, n) for _ in range(g - g // 2)], axis=1
    ).astype(np.float32)
    graph = build_graph(coords, n_neighbors=6)
    Z, _ = standardize(jnp.asarray(X))
    return coords, graph, Z


def _dense_quadform(graph, zp):
    """Oracle: Σ_e w_e zp[i] zp[j] per gene, dense f64."""
    idx = np.asarray(graph.neighbor_idx)
    w = np.asarray(graph.neighbor_w, np.float64)
    zp = np.asarray(zp, np.float64)
    out = np.zeros(zp.shape[1])
    for j in range(idx.shape[1]):
        out += (w[:, j:j + 1] * zp * zp[idx[:, j]]).sum(axis=0)
    return out


def test_plan_partitions_all_edges(setup):
    coords, graph, Z = setup
    plan = build_null_plan(graph, coords, block=64, halo=32)
    n, k = graph.neighbor_idx.shape
    n_band = int((np.asarray(plan.w_local) > 0).sum())
    n_far = int((np.asarray(plan.far_w) > 0).sum())
    assert n_band + n_far == n * k
    # every in-band weight + far weight sums to the total weight mass
    total = float(np.asarray(graph.neighbor_w).sum())
    got = float(np.asarray(plan.w_local).sum() + np.asarray(plan.far_w).sum())
    assert abs(total - got) < 1e-3


def test_banded_matches_dense_oracle_fixed_perm(setup):
    """The banded cross term reproduces the dense quadratic form exactly."""
    coords, graph, Z = setup
    plan = build_null_plan(graph, coords, block=64, halo=32)
    n = plan.n
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    # evaluate through the f32 path with n_permutations=1 by monkeypatching
    # the key stream is hard; instead compute the statistic directly
    from spatialcore_tpu.ops.banded import _banded_stat

    Z_r = Z[np.asarray(plan.order)]
    den = jnp.sum(Z * Z, axis=0)
    S0 = float(np.asarray(graph.neighbor_w).sum())
    got = _banded_stat(
        plan.order, plan.local_idx, plan.w_local, plan.far_src, plan.far_dst,
        plan.far_w, plan.rc_sum, Z_r, den, S0, jnp.asarray(perm),
        block=plan.block, halo=plan.halo, n=n, stat="moran", precision="f32")
    zp = np.asarray(Z_r)[perm]
    # oracle over the RELABELED graph: rebuild relabeled adjacency
    order = np.asarray(plan.order)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    idx_r = rank[np.asarray(graph.neighbor_idx)[order]]
    w_r = np.asarray(graph.neighbor_w, np.float64)[order]
    expect = np.zeros(zp.shape[1])
    zp64 = zp.astype(np.float64)
    for j in range(idx_r.shape[1]):
        expect += (w_r[:, j:j + 1] * zp64 * zp64[idx_r[:, j]]).sum(axis=0)
    expect = n / S0 * expect / np.asarray(den, np.float64)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-5)


@pytest.mark.parametrize("stat,alt", [("moran", "greater"), ("geary", "less")])
def test_banded_agrees_with_legacy(setup, stat, alt):
    """Same seeds => same permutations => near-identical null moments & p."""
    coords, graph, Z = setup
    plan = build_null_plan(graph, coords, block=64, halo=64)
    S0 = float(np.asarray(graph.neighbor_w).sum())
    obs = (moran_observed(graph, Z, S0) if stat == "moran"
           else geary_observed(graph, Z, S0))
    p_l, m_l, s_l = permutation_test_global(
        graph, Z, S0, obs, seed=11, n_permutations=199, stat=stat,
        alternative=alt)
    p_b, m_b, s_b = banded_permutation_test(
        plan, Z, S0, obs, seed=11, n_permutations=199, stat=stat,
        alternative=alt, precision="f32")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_l), atol=1e-5)
    # identical permutations: identical extreme counts except float ties
    np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_l), atol=0.02)
    # structured genes significant, noise genes not
    assert np.asarray(p_b)[0] <= 0.01


def test_banded_bf16_statistically_equivalent(setup):
    coords, graph, Z = setup
    plan = build_null_plan(graph, coords, block=64, halo=64)
    S0 = float(np.asarray(graph.neighbor_w).sum())
    obs = moran_observed(graph, Z, S0)
    p32, m32, _ = banded_permutation_test(
        plan, Z, S0, obs, seed=5, n_permutations=99, precision="f32")
    pbf, mbf, _ = banded_permutation_test(
        plan, Z, S0, obs, seed=5, n_permutations=99, precision="bf16")
    np.testing.assert_allclose(np.asarray(mbf), np.asarray(m32), atol=5e-3)
    np.testing.assert_allclose(np.asarray(pbf), np.asarray(p32), atol=0.05)


def test_halo_ladder_and_graph_order_fallback(setup):
    coords, graph, Z = setup
    plan_auto = build_null_plan(graph, coords, block=64)  # ladder pick
    valid = float(np.asarray(graph.neighbor_w).sum())
    n_far = int((np.asarray(plan_auto.far_w) > 0).sum())
    n_all = graph.n_cells * graph.degree
    assert n_far / n_all <= 0.5  # ladder found something sane
    # no-coords fallback (RCM) still partitions correctly
    plan_rcm = build_null_plan(graph, None, block=64, halo=64)
    got = float(np.asarray(plan_rcm.w_local).sum()
                + np.asarray(plan_rcm.far_w).sum())
    assert abs(got - valid) < 1e-3


def test_hilbert_order_locality():
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 50, (2000, 2))
    order = hilbert_order(coords)
    assert sorted(order.tolist()) == list(range(2000))
    # successive cells along the curve are spatially close on average
    d_curve = np.linalg.norm(np.diff(coords[order], axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(coords, axis=0), axis=1).mean()
    assert d_curve < d_rand / 5
