"""Getis-Ord Gi/Gi* vs a dense float64 oracle (Ord & Getis 1995)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialcore_tpu.ops.getis import getis_ord
from spatialcore_tpu.ops.graph import build_graph

from conftest import make_adata


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    n, g = 600, 5
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    X = rng.gamma(2.0, 1.0, (n, g)).astype(np.float32)
    # plant a hot spot for gene 0: boost cells near (25, 25)
    d = np.linalg.norm(coords - [25, 25], axis=1)
    X[:, 0] += 10.0 * np.exp(-(d / 10.0) ** 2)
    graph = build_graph(coords, n_neighbors=8)
    return coords, graph, X


def _oracle(graph, X, star):
    """Dense f64 Gi(*) z-scores straight from the published formulas."""
    idx = np.asarray(graph.neighbor_idx)
    valid = np.asarray(graph.valid)
    n, g = X.shape
    W = np.zeros((n, n))
    for i in range(n):
        for j in range(idx.shape[1]):
            if valid[i, j]:
                W[i, idx[i, j]] = 1.0
    if star:
        W[np.arange(n), np.arange(n)] = 1.0
    X64 = X.astype(np.float64)
    z = np.zeros((n, g))
    for i in range(n):
        wi = W[i]
        Wi = wi.sum()
        S1i = (wi ** 2).sum()
        if star:
            xbar = X64.mean(axis=0)
            s = X64.std(axis=0)
            m = n
        else:
            mask = np.ones(n, bool)
            mask[i] = False
            xbar = X64[mask].mean(axis=0)
            s = X64[mask].std(axis=0)
            m = n - 1
        num = wi @ X64 - xbar * Wi
        den = s * np.sqrt((m * S1i - Wi ** 2) / (m - 1))
        z[i] = num / den
    return z


@pytest.mark.parametrize("star", [True, False])
def test_gi_matches_oracle(setup, star):
    _, graph, X = setup
    res = getis_ord(graph, jnp.asarray(X), star=star)
    want = _oracle(graph, X, star)
    np.testing.assert_allclose(np.asarray(res.z_score), want,
                               rtol=2e-4, atol=2e-4)


def test_hotspot_detected(setup):
    coords, graph, X = setup
    res = getis_ord(graph, jnp.asarray(X), star=True)
    z = np.asarray(res.z_score)
    d = np.linalg.norm(coords - [25, 25], axis=1)
    core = d < 6
    # the planted bump is hot for gene 0, not for the noise genes
    assert z[core, 0].mean() > 3.0
    assert abs(z[core, 1:].mean()) < 1.0
    # analytic p consistent with z
    p = np.asarray(res.p_value)
    assert (p[core, 0] < 0.01).mean() > 0.8


def test_permutation_p_agrees_with_analytic(setup):
    _, graph, X = setup
    res = getis_ord(graph, jnp.asarray(X), star=True, seed=3,
                    n_permutations=199)
    z = np.asarray(res.z_score)
    psim = np.asarray(res.p_sim)
    strong = np.abs(z) > 4
    weak = np.abs(z) < 0.5
    assert psim[strong].mean() < 0.05
    assert psim[weak].mean() > 0.3


def test_z_invariant_to_uniform_row_weight_scale(setup):
    """Gi* z is invariant to per-row uniform weight scaling, so the
    binary formulation equals a row-standardized one (module docstring
    claim) — verified by scaling the graph's stored weights."""
    from spatialcore_tpu.ops.graph import SpatialGraph

    _, graph, X = setup
    rng = np.random.default_rng(5)
    scale = rng.uniform(0.2, 3.0, (graph.neighbor_w.shape[0], 1))
    scaled = SpatialGraph(
        neighbor_idx=graph.neighbor_idx,
        neighbor_w=graph.neighbor_w * jnp.asarray(scale, jnp.float32),
        valid=graph.valid,
        distances=graph.distances)
    r0 = getis_ord(graph, jnp.asarray(X), star=True)
    r1 = getis_ord(scaled, jnp.asarray(X), star=True)
    # the kernel reads only the validity mask, not the weights — z must
    # be bit-identical however the rows are scaled
    np.testing.assert_array_equal(np.asarray(r0.z_score),
                                  np.asarray(r1.z_score))


def test_sharded_matches_single_device(setup):
    from spatialcore_tpu.parallel import auto_mesh, sharded_getis_ord

    _, graph, X = setup
    X8 = np.concatenate([X, X[:, :3]], axis=1)  # gene axis divisible by 8
    mesh = auto_mesh()
    r1 = sharded_getis_ord(graph, jnp.asarray(X8), mesh, n_permutations=29)
    r0 = getis_ord(graph, jnp.asarray(X8), n_permutations=29)
    np.testing.assert_allclose(np.asarray(r1.z_score),
                               np.asarray(r0.z_score), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1.p_sim),
                                  np.asarray(r0.p_sim))


def test_public_wrapper(setup):
    coords, graph, X = setup
    adata = make_adata(n_obs=X.shape[0], n_vars=X.shape[1],
                       with_spatial=False)
    adata.obsm["spatial"] = coords
    adata.X = X.copy()
    import spatialcore_tpu as sct

    adata = sct.spatial.getis_ord_gi(adata, n_neighbors=8, seed=0)
    for s in ("G", "z", "p", "p_adj", "hotspot"):
        assert f"getis_ord_{s}" in adata.obsm
    hs = adata.obsm["getis_ord_hotspot"]
    d = np.linalg.norm(coords - [25, 25], axis=1)
    assert (hs[d < 6, 0] == 1).mean() > 0.7
    ops = adata.uns["spatialcore_metadata"]["operations"]
    assert any(o["function"] == "getis_ord_gi" for o in ops)

    import matplotlib

    matplotlib.use("Agg")
    from spatialcore_tpu.plotting import plot_spatial_hotspots

    genes = adata.uns["getis_ord_params"]["genes"]
    fig = plot_spatial_hotspots(adata, genes[0])
    assert fig.axes, "empty figure"
