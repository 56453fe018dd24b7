"""Golden-value tests for Moran's I / Geary's C / Lee's L against independent
numpy/scipy reference implementations using the squidpy/esda estimator
conventions (SURVEY.md §7 hard part 1)."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from conftest import make_adata


# ---------------------------------------------------------------------------
# Reference implementations (independent of the library code)
# ---------------------------------------------------------------------------

def ref_weights(coords, k):
    from sklearn.neighbors import NearestNeighbors

    n = coords.shape[0]
    nn = NearestNeighbors(n_neighbors=k + 1).fit(coords)
    _, idx = nn.kneighbors(coords)
    rows = np.repeat(np.arange(n), k)
    W = sp.csr_matrix((np.ones(n * k), (rows, idx[:, 1:].ravel())), shape=(n, n))
    return W.multiply(1.0 / np.asarray(W.sum(axis=1))).tocsr()


def ref_moran(W, x):
    n = len(x)
    z = x - x.mean()
    S0 = W.sum()
    return float(n / S0 * (z @ (W @ z)) / (z @ z))


def ref_geary(W, x):
    n = len(x)
    z = x - x.mean()
    Wc = W.tocoo()
    num = (Wc.data * (x[Wc.row] - x[Wc.col]) ** 2).sum()
    return float((n - 1) * num / (2 * W.sum() * (z @ z)))


def ref_local_moran(W, x):
    z = (x - x.mean()) / x.std()
    lag = W @ z
    return z * lag, z, lag


def ref_lees_l(W, x, y):
    zx = (x - x.mean()) / x.std()
    zy = (y - y.mean()) / y.std()
    lag = W @ zy
    return zx * lag, float((zx * lag).sum()), lag


def smooth_field(coords, seed=0, scale=200.0):
    """Spatially smooth values: strong positive autocorrelation."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(coords.min(), coords.max(), (5, 2))
    vals = np.zeros(coords.shape[0])
    for c in centers:
        d2 = ((coords - c) ** 2).sum(1)
        vals += np.exp(-d2 / (2 * scale ** 2))
    return vals + rng.normal(0, 0.01, coords.shape[0])


@pytest.fixture(scope="module")
def spatial_adata():
    adata = make_adata(n_obs=400, n_vars=10, seed=5)
    coords = np.asarray(adata.obsm["spatial"], dtype=np.float64)
    # gene 0: smooth (autocorrelated); others: iid noise
    X = np.asarray(adata.X, dtype=np.float64)
    X[:, 0] = smooth_field(coords) * 10
    adata.X = X.astype(np.float32)
    return adata


# ---------------------------------------------------------------------------
# Global Moran's I
# ---------------------------------------------------------------------------

def test_morans_i_matches_reference(spatial_adata):
    from spatialcore_tpu.spatial import morans_i

    adata = spatial_adata.copy()
    morans_i(adata, n_neighbors=6, n_permutations=0)
    df = adata.uns["morans_i"]
    assert list(df.columns) == ["gene", "I", "expected_I", "z_score", "p_value"]

    W = ref_weights(np.asarray(adata.obsm["spatial"]), 6)
    X = np.asarray(adata.X, dtype=np.float64)
    for i, g in enumerate(adata.var_names):
        expected = ref_moran(W, X[:, i])
        got = float(df.loc[df.gene == g, "I"].iloc[0])
        assert abs(got - expected) < 1e-5, (g, got, expected)
    np.testing.assert_allclose(df["expected_I"], -1 / (400 - 1), rtol=1e-6)


def test_morans_i_detects_structure(spatial_adata):
    from spatialcore_tpu.spatial import morans_i

    adata = spatial_adata.copy()
    morans_i(adata, n_permutations=99, seed=0)
    df = adata.uns["morans_i"].set_index("gene")
    assert df.loc["GENE0", "I"] > 0.3          # smooth field: strong autocorr
    assert df.loc["GENE0", "p_value"] <= 0.01  # minimum possible = 1/100
    noise_I = df.drop("GENE0")["I"]
    assert (noise_I.abs() < 0.15).all()


def test_morans_i_permutation_reproducible(spatial_adata):
    from spatialcore_tpu.spatial import morans_i

    a1, a2 = spatial_adata.copy(), spatial_adata.copy()
    morans_i(a1, n_permutations=49, seed=7)
    morans_i(a2, n_permutations=49, seed=7)
    pd.testing.assert_frame_equal(a1.uns["morans_i"], a2.uns["morans_i"])
    a3 = spatial_adata.copy()
    morans_i(a3, n_permutations=49, seed=8)
    assert not a1.uns["morans_i"]["p_value"].equals(a3.uns["morans_i"]["p_value"])


def test_moran_analytic_variance_matches_empirical():
    """Var_rand from Cliff-Ord must match the empirical permutation variance."""
    from spatialcore_tpu.ops import (build_graph, graph_moments,
                                     moran_analytic_moments, moran_observed,
                                     permutation_test_global, standardize)

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 100, (300, 2)).astype(np.float32)
    x = rng.gamma(2.0, 1.0, 300).astype(np.float32)  # skewed, tests b2 term
    g = build_graph(coords, n_neighbors=8)
    m = graph_moments(g)
    Z, _ = standardize(jnp.asarray(x[:, None]))
    EI, var_rand = moran_analytic_moments(Z, m["S0"], m["S1"], m["S2"],
                                          "randomization")
    obs = moran_observed(g, Z, m["S0"])
    _, perm_mean, perm_std = permutation_test_global(
        g, Z, m["S0"], obs, 0, 2000, stat="moran")
    assert abs(float(perm_mean[0]) - EI) < 0.005
    assert abs(float(perm_std[0]) - float(jnp.sqrt(var_rand[0]))) / float(
        jnp.sqrt(var_rand[0])) < 0.08


def test_use_existing_graph(spatial_adata):
    from spatialcore_tpu.spatial import build_spatial_weights, morans_i

    adata = spatial_adata.copy()
    build_spatial_weights(adata, n_neighbors=6)
    assert "spatial_graph" in adata.uns
    morans_i(adata, n_permutations=0, use_existing_graph=True)
    assert "morans_i" in adata.uns


def test_morans_i_validation(spatial_adata):
    from spatialcore_tpu.spatial import morans_i

    adata = spatial_adata.copy()
    with pytest.raises(ValueError, match="not found in adata.var_names"):
        morans_i(adata, genes=["NOPE"])
    del adata.obsm["spatial"]
    with pytest.raises(ValueError, match="spatial"):
        morans_i(adata)


# ---------------------------------------------------------------------------
# Geary's C
# ---------------------------------------------------------------------------

def test_gearys_c_matches_reference(spatial_adata):
    from spatialcore_tpu.spatial import gearys_c

    adata = spatial_adata.copy()
    gearys_c(adata, n_permutations=0)
    df = adata.uns["gearys_c"].set_index("gene")
    W = ref_weights(np.asarray(adata.obsm["spatial"]), 6)
    X = np.asarray(adata.X, dtype=np.float64)
    for i, g in enumerate(adata.var_names):
        assert abs(df.loc[g, "C"] - ref_geary(W, X[:, i])) < 1e-5
    assert df.loc["GENE0", "C"] < 0.8  # positive autocorr → C < 1
    assert (df["expected_C"] == 1.0).all()


def test_gearys_c_permutation_significance(spatial_adata):
    from spatialcore_tpu.spatial import gearys_c

    adata = spatial_adata.copy()
    gearys_c(adata, genes=["GENE0"], n_permutations=99, seed=0)
    df = adata.uns["gearys_c"].set_index("gene")
    assert df.loc["GENE0", "p_value"] <= 0.01


# ---------------------------------------------------------------------------
# Local Moran
# ---------------------------------------------------------------------------

def test_local_morans_i_matches_reference(spatial_adata):
    from spatialcore_tpu.spatial import local_morans_i

    adata = spatial_adata.copy()
    local_morans_i(adata, n_permutations=0)
    W = ref_weights(np.asarray(adata.obsm["spatial"]), 6)
    X = np.asarray(adata.X, dtype=np.float64)
    for i in range(adata.n_vars):
        ref_I, ref_z, ref_lag = ref_local_moran(W, X[:, i])
        np.testing.assert_allclose(adata.obsm["local_morans_I"][:, i], ref_I,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(adata.obsm["local_morans_z"][:, i], ref_z,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(adata.obsm["local_morans_lag"][:, i], ref_lag,
                                   rtol=1e-4, atol=1e-4)


def test_local_morans_outputs_and_quadrants(spatial_adata):
    from spatialcore_tpu.spatial import local_morans_i

    adata = spatial_adata.copy()
    # fdr="none": with 49 perms the p floor (1/50) cannot survive BH over
    # 400 cells, so everything would be NS — an expected small-P artifact.
    local_morans_i(adata, genes=["GENE0", "GENE1"], n_permutations=49, seed=0,
                   fdr_correction="none")
    for suffix in ("I", "z", "lag", "p", "p_adj", "quadrant"):
        assert f"local_morans_{suffix}" in adata.obsm
        assert adata.obsm[f"local_morans_{suffix}"].shape == (400, 2)
    q = adata.obsm["local_morans_quadrant"]
    assert set(np.unique(q)).issubset({0, 1, 2, 3, 4})
    # smooth gene should yield significant HH/LL cells
    assert ((q[:, 0] == 1) | (q[:, 0] == 2)).sum() > 20
    p = adata.obsm["local_morans_p"]
    padj = adata.obsm["local_morans_p_adj"]
    assert (padj >= p - 1e-7).all()  # BH never decreases p
    params = adata.uns["local_morans_params"]
    assert params["genes"] == ["GENE0", "GENE1"]
    assert "computation_time_seconds" in params


def test_local_morans_zero_variance_gene():
    from spatialcore_tpu.spatial import local_morans_i

    adata = make_adata(n_obs=100, n_vars=3, seed=1)
    X = np.asarray(adata.X)
    X[:, 2] = 5.0
    adata.X = X
    local_morans_i(adata, n_permutations=9)
    assert (adata.obsm["local_morans_I"][:, 2] == 0).all()
    assert (adata.obsm["local_morans_p"][:, 2] == 1.0).all()
    assert (adata.obsm["local_morans_quadrant"][:, 2] == 0).all()


# ---------------------------------------------------------------------------
# Lee's L
# ---------------------------------------------------------------------------

def test_lees_l_matches_reference(spatial_adata):
    from spatialcore_tpu.spatial import lees_l

    adata = spatial_adata.copy()
    res = lees_l(adata, ("GENE0", "GENE1"), n_permutations=0)
    W = ref_weights(np.asarray(adata.obsm["spatial"]), 6)
    X = np.asarray(adata.X, dtype=np.float64)
    _, ref_L, _ = ref_lees_l(W, X[:, 0], X[:, 1])
    assert abs(res["L"] - ref_L) < 1e-2 * max(1.0, abs(ref_L))
    assert res["gene_x"] == "GENE0"

    multi = lees_l(adata, [("GENE0", "GENE1"), ("GENE2", "GENE3")],
                   n_permutations=19, seed=0)
    assert isinstance(multi, list) and len(multi) == 2
    assert all(0 < r["p_value"] <= 1 for r in multi)


def test_lees_l_self_pair_significant(spatial_adata):
    from spatialcore_tpu.spatial import lees_l

    adata = spatial_adata.copy()
    res = lees_l(adata, ("GENE0", "GENE0"), n_permutations=99, seed=0)
    assert res["L"] > 0
    assert res["p_value"] <= 0.02


def test_lees_l_local_outputs(spatial_adata):
    from spatialcore_tpu.spatial import lees_l_local

    adata = spatial_adata.copy()
    lees_l_local(adata, gene_pairs=("GENE0", "GENE1"), n_permutations=19,
                 compute_cell_pvalues=True, seed=0)
    assert "GENE0_GENE1_lees_l" in adata.obs
    assert "GENE0_GENE1_quadrant" in adata.obs
    assert "GENE0_GENE1_pvalue" in adata.obs
    params = adata.uns["GENE0_GENE1_lees_l_params"]
    assert set(params["quadrant_counts"]) == {"NS", "HH", "LL", "HL", "LH"}
    assert sum(params["quadrant_counts"].values()) == 400

    W = ref_weights(np.asarray(adata.obsm["spatial"]), 6)
    X = np.asarray(adata.X, dtype=np.float64)
    ref_local, ref_L, _ = ref_lees_l(W, X[:, 0], X[:, 1])
    np.testing.assert_allclose(adata.obs["GENE0_GENE1_lees_l"], ref_local,
                               rtol=1e-3, atol=1e-3)
    assert abs(params["global_L"] - ref_L) < 1e-2 * max(1.0, abs(ref_L))


def test_lees_l_local_all_pairs_mode(spatial_adata):
    from spatialcore_tpu.spatial import lees_l_local

    adata = spatial_adata.copy()
    lees_l_local(adata, genes=["GENE0", "GENE1", "GENE2"], n_permutations=0)
    for key in ("GENE0_GENE1", "GENE0_GENE2", "GENE1_GENE2"):
        assert f"{key}_lees_l" in adata.obs


def test_lees_l_local_significance_filter_requires_pvalues(spatial_adata):
    from spatialcore_tpu.spatial import lees_l_local

    with pytest.raises(ValueError, match="requires compute_cell_pvalues"):
        lees_l_local(spatial_adata.copy(), gene_pairs=("GENE0", "GENE1"),
                     significance_filter=True)


def test_fdr_bh_matches_scipy():
    from scipy.stats import false_discovery_control

    from spatialcore_tpu.ops import benjamini_hochberg

    rng = np.random.default_rng(0)
    p = rng.uniform(0, 1, 200).astype(np.float32)
    ours = np.asarray(benjamini_hochberg(jnp.asarray(p)))
    ref = false_discovery_control(p.astype(np.float64), method="bh")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_fdr_bh_discrete_bitwise_equals_sort_path():
    """benjamini_hochberg_discrete must be BITWISE equal to the sort-based
    BH on grid-valued inputs ((c+1)/L — every permutation p in this
    package), including heavy ties, empty levels, all-ones columns, and
    multi-gene matrices."""
    from spatialcore_tpu.ops.fdr import (apply_fdr, benjamini_hochberg,
                                         benjamini_hochberg_discrete)

    rng = np.random.default_rng(3)
    for L, shape in ((20, (400,)), (100, (1000, 7)), (8, (64, 3))):
        c = rng.integers(0, L, size=shape)
        c[..., :1] = L - 1 if c.ndim == 1 else c[..., :1]  # tie mass
        p = ((c + 1) / L).astype(np.float32)
        if p.ndim == 2:
            p[:, 1] = 1.0                       # an all-ones column
            p[: L // 2, 2] = 1.0 / L            # heavy low-tie column
        ref = np.asarray(benjamini_hochberg(jnp.asarray(p), axis=0))
        fast = np.asarray(
            benjamini_hochberg_discrete(jnp.asarray(p), L, axis=0))
        np.testing.assert_array_equal(fast, ref)
        via = np.asarray(apply_fdr(jnp.asarray(p), "fdr_bh", axis=0,
                                   n_levels=L))
        np.testing.assert_array_equal(via, ref)
    # axis=1 route
    p = ((rng.integers(0, 20, size=(5, 300)) + 1) / 20).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(benjamini_hochberg_discrete(jnp.asarray(p), 20, axis=1)),
        np.asarray(benjamini_hochberg(jnp.asarray(p), axis=1)))
    # ulp-off grid: p produced via reciprocal-multiply (as the two-sided
    # doubling path does) lands 1 ulp off (c+1)/L for ~30% of counts; the
    # discrete path must use the STORED bits, not a recomputed grid
    L = 200
    c = rng.integers(0, L, size=(500, 4)).astype(np.float32)
    p = np.minimum(((c + 1) * np.float32(1.0 / L)).astype(np.float32), 1.0)
    assert np.any(p != ((np.round(p * L)).astype(np.float32) / L))
    np.testing.assert_array_equal(
        np.asarray(benjamini_hochberg_discrete(jnp.asarray(p), L, axis=0)),
        np.asarray(benjamini_hochberg(jnp.asarray(p), axis=0)))


def test_join_counts_detect_clustering(spatial_adata):
    """Clustered binary labels → significant BB, depleted BW."""
    from spatialcore_tpu.spatial import join_count_statistics

    adata = spatial_adata.copy()
    coords = np.asarray(adata.obsm["spatial"])
    # label the left half "black" → strong spatial clustering
    adata.obs["left"] = coords[:, 0] < np.median(coords[:, 0])
    adata = join_count_statistics(adata, "left", n_permutations=199, seed=0)
    res = adata.uns["join_counts"]
    assert res["p_BB"] <= 0.01
    assert res["p_BW"] <= 0.01            # fewer BW joins than the null
    # brute-force BB check on the binary adjacency
    from spatialcore_tpu.spatial.autocorrelation import _load_stored_graph
    g = _load_stored_graph(adata)
    idx = np.asarray(g.neighbor_idx)
    adj = np.asarray(g.neighbor_w) > 0
    x = adata.obs["left"].to_numpy()
    bb = sum(adj[i, j] and x[i] and x[idx[i, j]]
             for i in range(len(x)) for j in range(idx.shape[1]))
    np.testing.assert_allclose(res["BB"], bb)

    # random labels → non-significant
    rng = np.random.default_rng(0)
    adata.obs["rand"] = rng.uniform(size=adata.n_obs) < 0.5
    adata = join_count_statistics(adata, "rand", n_permutations=199,
                                  seed=0, key_added="jc_rand")
    assert adata.uns["jc_rand"]["p_BB"] > 0.03  # deterministic w/ fixed seeds

    adata.obs["ct"] = ["A", "B"] * (adata.n_obs // 2)
    with pytest.raises(ValueError, match="not boolean"):
        join_count_statistics(adata, "ct")
    adata = join_count_statistics(adata, "ct", category="A",
                                  n_permutations=49, key_added="jc_cat")
    assert "BB" in adata.uns["jc_cat"]
    with pytest.raises(ValueError, match="constant"):
        adata.obs["const"] = True
        join_count_statistics(adata, "const")


def test_local_gearys_c(spatial_adata):
    from spatialcore_tpu.spatial import local_gearys_c

    adata = spatial_adata.copy()
    adata = local_gearys_c(adata, n_permutations=99, seed=0)
    C = adata.obsm["local_geary_C"]
    p = adata.obsm["local_geary_p"]
    assert C.shape == (adata.n_obs, adata.n_vars)
    assert (C >= 0).all() and (p > 0).all() and (p <= 1).all()

    # brute-force check for one gene against the dense formula
    from spatialcore_tpu.spatial.autocorrelation import _load_stored_graph
    g = _load_stored_graph(adata)
    idx = np.asarray(g.neighbor_idx)
    w = np.asarray(g.neighbor_w)
    X = np.asarray(adata.X.todense()) if hasattr(adata.X, "todense") \
        else np.asarray(adata.X)
    x = X[:, 0].astype(np.float64)
    z = (x - x.mean()) / x.std()
    want = np.array([sum(w[i, j] * (z[i] - z[idx[i, j]]) ** 2
                         for j in range(idx.shape[1]))
                     for i in range(len(z))])
    np.testing.assert_allclose(C[:, 0], want, rtol=1e-3, atol=1e-4)

    # the structured gene's coherent cells get significant low-C p-values
    structured_p = p[:, 0]
    assert (structured_p < 0.05).mean() > 0.2


def test_local_geary_conditional_vs_total_null(spatial_adata):
    """Both nulls agree on strong structure; the conditional null never
    draws a cell's own value (VERDICT item 10)."""
    import jax.numpy as jnp

    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import local_geary, standardize

    adata = spatial_adata.copy()
    coords = np.asarray(adata.obsm["spatial"])
    graph = build_graph(coords, n_neighbors=6)
    X = np.asarray(adata.X if not hasattr(adata.X, "todense")
                   else adata.X.todense(), np.float32)
    Z, _ = standardize(jnp.asarray(X[:, :3]))

    res_c = local_geary(graph, Z, seed=0, n_permutations=199,
                        null="conditional")
    res_t = local_geary(graph, Z, seed=0, n_permutations=199, null="total")
    # identical observed statistic
    np.testing.assert_allclose(np.asarray(res_c.local_C),
                               np.asarray(res_t.local_C), rtol=1e-6)
    p_c = np.asarray(res_c.p_value)
    p_t = np.asarray(res_t.p_value)
    # structured gene 0: both nulls flag a sizable significant fraction,
    # and the two schemes broadly agree cell-by-cell
    assert (p_c[:, 0] < 0.05).mean() > 0.15
    assert (p_t[:, 0] < 0.05).mean() > 0.15
    agree = ((p_c[:, 0] < 0.05) == (p_t[:, 0] < 0.05)).mean()
    assert agree > 0.8
    # public API exposes the choice and records it
    from spatialcore_tpu.spatial import local_gearys_c

    out = local_gearys_c(adata, genes=list(adata.var_names[:2]),
                         n_permutations=49, null="total")
    assert out.uns["local_geary_params"]["null"] == "total"


def test_local_moran_conditional_vs_total_null(spatial_adata):
    """GeoDa conditional LISA null vs the reference's total shuffle."""
    import jax.numpy as jnp

    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.moran import local_moran, standardize

    adata = spatial_adata.copy()
    coords = np.asarray(adata.obsm["spatial"])
    graph = build_graph(coords, n_neighbors=6)
    X = np.asarray(adata.X if not hasattr(adata.X, "todense")
                   else adata.X.todense(), np.float32)
    Z, _ = standardize(jnp.asarray(X[:, :3]))

    res_c = local_moran(graph, Z, seed=0, n_permutations=199,
                        null="conditional")
    res_t = local_moran(graph, Z, seed=0, n_permutations=199, null="total")
    np.testing.assert_allclose(np.asarray(res_c.local_I),
                               np.asarray(res_t.local_I), rtol=1e-6)
    p_c = np.asarray(res_c.p_value)
    p_t = np.asarray(res_t.p_value)
    assert (p_c[:, 0] < 0.05).mean() > 0.15
    assert (p_t[:, 0] < 0.05).mean() > 0.15
    agree = ((p_c[:, 0] < 0.05) == (p_t[:, 0] < 0.05)).mean()
    assert agree > 0.8
    # public API exposes + records the choice
    import spatialcore_tpu as sct

    out = sct.spatial.local_morans_i(
        adata, genes=list(adata.var_names[:2]), n_permutations=49,
        null="conditional")
    assert out.uns["local_morans_params"]["null"] == "conditional"


def test_moran_correlogram():
    """I(d) decays with distance for a smooth field; noise stays flat."""
    import spatialcore_tpu as sct
    from conftest import make_adata

    rng = np.random.default_rng(0)
    n = 3000
    coords = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
    X = np.stack([
        np.sin(coords[:, 0] / 60) + np.cos(coords[:, 1] / 60)
        + rng.normal(0, 0.3, n),
        rng.normal(0, 1, n)], axis=1).astype(np.float32)
    a = make_adata(n_obs=n, n_vars=2, with_spatial=False)
    a.obsm["spatial"] = coords
    a.X = X
    a = sct.spatial.moran_correlogram(a, n_bands=4, n_permutations=49,
                                      seed=0)
    df = a.uns["moran_correlogram"]
    assert set(df.columns) >= {"band_lo", "band_hi", "gene", "I",
                               "z_score", "p_value", "p_sim"}
    smooth = df[df.gene == a.var_names[0]].sort_values("band_lo")
    assert len(smooth) == 4
    assert smooth["I"].iloc[0] > 0.5
    assert smooth["I"].iloc[0] > smooth["I"].iloc[-1]  # decays with distance
    assert (smooth["p_sim"] < 0.05).all()
    noise = df[df.gene == a.var_names[1]]
    assert noise["I"].abs().max() < 0.1
    assert (noise["p_value"] > 0.05).mean() >= 0.75
    # explicit bands + validation
    with pytest.raises(ValueError, match="increasing"):
        sct.spatial.moran_correlogram(a, bands=[10.0, 5.0])


def test_morans_i_banded_null_method(spatial_adata):
    """null_method='banded' through the public API matches 'slots' inference."""
    a1 = spatial_adata.copy()
    a2 = spatial_adata.copy()
    a1 = __import__("spatialcore_tpu").spatial.morans_i(
        a1, n_permutations=99, seed=0, null_method="banded")
    a2 = __import__("spatialcore_tpu").spatial.morans_i(
        a2, n_permutations=99, seed=0, null_method="slots")
    df1 = a1.uns["morans_i"].set_index("gene")
    df2 = a2.uns["morans_i"].set_index("gene")
    np.testing.assert_allclose(df1["I"], df2["I"], rtol=1e-6)
    # different draw streams, same inference on the structured gene
    assert df1.loc["GENE0", "p_value"] <= 0.02
    assert df2.loc["GENE0", "p_value"] <= 0.02
    assert a1.uns["morans_i_params" if "morans_i_params" in a1.uns else
                  "morans_i"] is not None


def test_morans_i_banded_int8_null_method(spatial_adata):
    """null_method='banded_int8': same observed I (f32), same inference,
    provenance records the quantized null."""
    import spatialcore_tpu as sct

    a1 = spatial_adata.copy()
    a2 = spatial_adata.copy()
    a1 = sct.spatial.morans_i(a1, n_permutations=99, seed=0,
                              null_method="banded_int8")
    a2 = sct.spatial.morans_i(a2, n_permutations=99, seed=0,
                              null_method="banded")
    df1 = a1.uns["morans_i"].set_index("gene")
    df2 = a2.uns["morans_i"].set_index("gene")
    np.testing.assert_allclose(df1["I"], df2["I"], rtol=1e-6)
    assert df1.loc["GENE0", "p_value"] <= 0.02
    sig1 = df1["p_value"] < 0.05
    sig2 = df2["p_value"] < 0.05
    assert (sig1 == sig2).all()
    ops = a1.uns["spatialcore_metadata"]["operations"]
    assert ops[-1]["parameters"]["null_method"] == "banded_int8"


def test_local_morans_i_banded_int8_null_method(spatial_adata):
    """local_morans_i(null_method='banded_int8'): exact observed obsm
    outputs, quantized-null p at decision-level agreement, params record
    the mode."""
    import spatialcore_tpu as sct

    a1 = spatial_adata.copy()
    a2 = spatial_adata.copy()
    a1 = sct.spatial.local_morans_i(a1, n_permutations=99, seed=0,
                                    null_method="banded_int8")
    a2 = sct.spatial.local_morans_i(a2, n_permutations=99, seed=0)
    np.testing.assert_allclose(a1.obsm["local_morans_I"],
                               a2.obsm["local_morans_I"], rtol=1e-6)
    np.testing.assert_allclose(a1.obsm["local_morans_z"],
                               a2.obsm["local_morans_z"], rtol=1e-6)
    sig1 = a1.obsm["local_morans_p"] < 0.05
    sig2 = a2.obsm["local_morans_p"] < 0.05
    assert (sig1 == sig2).mean() > 0.95   # different draw streams
    assert a1.uns["local_morans_params"]["null_method"] == "banded_int8"
    assert a2.uns["local_morans_params"]["null_method"] == "slots"


def test_local_join_counts(spatial_adata):
    """Clustered binary condition: positives in the hotspot get small p."""
    import spatialcore_tpu as sct

    adata = spatial_adata.copy()
    coords = np.asarray(adata.obsm["spatial"])
    # binary condition clustered in a corner
    hot = (coords[:, 0] < np.quantile(coords[:, 0], 0.3)) & \
          (coords[:, 1] < np.quantile(coords[:, 1], 0.3))
    rng = np.random.default_rng(0)
    x = hot | (rng.random(len(hot)) < 0.05)
    adata.obs["cond"] = x
    adata = sct.spatial.local_join_counts(adata, "cond", n_permutations=199,
                                          seed=0)
    bb = adata.obs["cond_local_jc_BB"].to_numpy()
    p = adata.obs["cond_local_jc_p"].to_numpy()
    assert (p[~x] == 1.0).all()            # negatives: no statistic
    assert (p[hot] < 0.05).mean() > 0.5    # hotspot positives cluster
    scattered = x & ~hot
    if scattered.sum() >= 5:
        assert (p[scattered] < 0.05).mean() < 0.4
    assert bb.max() > 0


def test_local_geary_multivariate(spatial_adata):
    import spatialcore_tpu as sct

    adata = spatial_adata.copy()
    adata = sct.spatial.local_gearys_c_multivariate(
        adata, genes=list(adata.var_names[:3]), n_permutations=199, seed=0)
    c = adata.obs["local_geary_mv"].to_numpy()
    p = adata.obs["local_geary_mv_p"].to_numpy()
    assert np.isfinite(c).all() and (c >= 0).all()
    assert (p < 0.05).mean() > 0.1   # structured genes -> coherent cells
    # deterministic
    a2 = sct.spatial.local_gearys_c_multivariate(
        spatial_adata.copy(), genes=list(adata.var_names[:3]),
        n_permutations=199, seed=0)
    np.testing.assert_array_equal(a2.obs["local_geary_mv_p"].to_numpy(), p)


def test_correlogram_kernel_matches_per_band_oracle():
    """The one-dispatch kernel's on-device Cliff-Ord moments and I values
    must match the round-2 per-band path (band graph -> host CSR moments
    -> moran_observed) exactly (f32)."""
    import jax.numpy as jnp

    import spatialcore_tpu as sct
    from spatialcore_tpu.ops.graph import (
        SpatialGraph, graph_moments, radius_neighbors)
    from spatialcore_tpu.ops.moran import (
        correlogram_kernel, moran_analytic_moments, moran_observed,
        standardize)

    rng = np.random.default_rng(3)
    n = 800
    coords = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    X = np.stack([np.sin(coords[:, 0] / 40) + rng.normal(0, 0.4, n),
                  rng.normal(0, 1, n)], axis=1).astype(np.float32)
    bands = np.array([0.0, 15.0, 30.0, 60.0], np.float32)

    idx, dist, valid = radius_neighbors(jnp.asarray(coords),
                                        float(bands[-1]), 64)
    Z, _ = standardize(jnp.asarray(X))
    I_k, z_k, p_k, _, S0_k = correlogram_kernel(
        idx, dist, valid, Z, jnp.asarray(bands), jnp.uint32(0),
        n_permutations=0)

    for b in range(len(bands) - 1):
        lo, hi = float(bands[b]), float(bands[b + 1])
        in_band = valid & (dist >= lo) & (dist < hi)
        deg = jnp.sum(in_band, axis=1)
        w = jnp.where(in_band, 1.0, 0.0) / jnp.maximum(deg, 1)[:, None]
        gband = SpatialGraph(
            neighbor_idx=jnp.where(in_band, idx, 0).astype(jnp.int32),
            neighbor_w=w.astype(jnp.float32),
            valid=in_band,
            distances=jnp.where(in_band, dist, jnp.inf))
        m = graph_moments(gband)
        np.testing.assert_allclose(float(S0_k[b]), m["S0"], rtol=1e-6)
        I_ref = np.asarray(moran_observed(gband, Z, m["S0"]))
        np.testing.assert_allclose(np.asarray(I_k)[b], I_ref,
                                   rtol=1e-4, atol=1e-6)
        mu, var = moran_analytic_moments(Z, m["S0"], m["S1"], m["S2"],
                                         assumption="randomization")
        z_ref = (I_ref - mu) / np.sqrt(np.maximum(np.asarray(var), 1e-30))
        np.testing.assert_allclose(np.asarray(z_k)[b], z_ref,
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Device-resident X (zero host round-trip)
# ---------------------------------------------------------------------------

def test_device_resident_x_matches_numpy(spatial_adata):
    """A jax-array X must produce identical statistics to numpy X without
    being pulled back to host (the tunnel-backed transfer is the cost at
    scale — docs/performance.md). Exercises the jax branch of
    _dense_expression through global Moran, LISA, and Lee's L."""
    from spatialcore_tpu.spatial import lees_l, local_morans_i, morans_i

    a_np = spatial_adata.copy()
    a_dev = spatial_adata.copy()
    a_dev.X = jnp.asarray(np.asarray(spatial_adata.X, dtype=np.float32))

    results = {}
    for name, a in (("np", a_np), ("dev", a_dev)):
        morans_i(a, n_neighbors=6, n_permutations=19, seed=3)
        # batch_size=2 on 3 genes exercises the multi-batch concat in
        # device-output mode
        local_morans_i(a, genes=["GENE0", "GENE1", "GENE2"], n_neighbors=6,
                       n_permutations=19, seed=3, batch_size=2,
                       use_existing_graph=True)
        results[name] = lees_l(a, gene_pairs=("GENE0", "GENE1"),
                               n_permutations=19, seed=3,
                               use_existing_graph=True)

    pd.testing.assert_frame_equal(a_np.uns["morans_i"], a_dev.uns["morans_i"])
    np.testing.assert_array_equal(np.asarray(a_np.obsm["local_morans_I"]),
                                  np.asarray(a_dev.obsm["local_morans_I"]))
    np.testing.assert_array_equal(np.asarray(a_np.obsm["local_morans_p"]),
                                  np.asarray(a_dev.obsm["local_morans_p"]))
    assert results["np"]["L"] == results["dev"]["L"]
    assert results["np"]["p_value"] == results["dev"]["p_value"]
    assert isinstance(a_dev.X, jax.Array)  # stayed on device
    # device-resident input => device-resident [N, G] LISA outputs (no
    # GB-scale readback over the tunnel); numpy input => numpy outputs
    assert isinstance(a_dev.obsm["local_morans_p_adj"], jax.Array)
    assert isinstance(a_np.obsm["local_morans_p_adj"], np.ndarray)

    # same contract for the other [N, G]-output statistics
    from spatialcore_tpu.spatial import getis_ord_gi, local_gearys_c

    for a in (a_np, a_dev):
        getis_ord_gi(a, genes=["GENE0", "GENE1", "GENE2"], n_neighbors=6,
                     n_permutations=19, seed=3, batch_size=2,
                     use_existing_graph=True)
        local_gearys_c(a, genes=["GENE0", "GENE1", "GENE2"], n_neighbors=6,
                       n_permutations=19, seed=3, batch_size=2,
                       use_existing_graph=True)
    for k in ("getis_ord_z", "getis_ord_hotspot", "local_geary_C",
              "local_geary_p_adj"):
        key = k if k in a_dev.obsm else None
        assert key is not None, (k, list(a_dev.obsm))
        np.testing.assert_array_equal(np.asarray(a_np.obsm[k]),
                                      np.asarray(a_dev.obsm[k]))
        assert isinstance(a_dev.obsm[k], jax.Array), k
        assert isinstance(a_np.obsm[k], np.ndarray), k


def test_empty_gene_list_writes_empty_outputs(spatial_adata):
    """genes=[] must keep the documented [N, 0] obsm outputs instead of
    crashing (review finding: the device-mode refactor left the output
    arrays None when the batch loop never ran)."""
    from spatialcore_tpu.spatial import (
        getis_ord_gi, local_gearys_c, local_morans_i)

    adata = spatial_adata.copy()
    local_morans_i(adata, genes=[], n_neighbors=6, n_permutations=5)
    assert adata.obsm["local_morans_I"].shape == (adata.n_obs, 0)
    local_gearys_c(adata, genes=[], n_neighbors=6, n_permutations=5,
                   use_existing_graph=True)
    assert adata.obsm["local_geary_C"].shape == (adata.n_obs, 0)
    getis_ord_gi(adata, genes=[], n_neighbors=6, n_permutations=5,
                 use_existing_graph=True)
    assert adata.obsm["getis_ord_z"].shape == (adata.n_obs, 0)


def test_copy_preserves_device_resident_x():
    """adata.copy() must not hostify a jax X (review finding: np.array in
    _copy_matrix forced a full readback; jax arrays are immutable so
    sharing the buffer IS a safe copy)."""
    import jax

    a = make_adata(n_obs=50, n_vars=4)
    a.X = jnp.asarray(np.asarray(a.X, dtype=np.float32))
    b = a.copy()
    assert isinstance(b.X, jax.Array)


def test_lees_l_invalid_null_method_raises_even_at_p0(spatial_adata):
    """null_method typos must fail loudly regardless of n_permutations
    (review finding: the P<=0 early-out skipped validation)."""
    from spatialcore_tpu.spatial import lees_l

    adata = spatial_adata.copy()
    with pytest.raises(ValueError, match="null_method"):
        lees_l(adata, ("GENE0", "GENE1"), n_permutations=0,
               null_method="bandedd")


def test_copy_does_not_alias_mutable_obsm():
    """pd.Categorical (mutable, shape+dtype) must still convert to numpy
    on obsm set so .copy() cannot alias it (review finding)."""
    a = make_adata(n_obs=4, n_vars=2)
    a.obsm["anno"] = pd.Categorical(["a", "b", "a", "b"])
    assert isinstance(a.obsm["anno"], np.ndarray)
    b = a.copy()
    b.obsm["anno"][0] = "b"
    assert a.obsm["anno"][0] == "a"


def test_null_plan_cached_across_stat_calls(spatial_adata):
    """lees_l -> lees_l_local -> local_morans_i on the same stored graph
    build the banded NullPlan once (review finding: three identical
    Hilbert relabels per pipeline)."""
    from unittest import mock

    from spatialcore_tpu.ops import banded
    from spatialcore_tpu.spatial import (build_spatial_weights, lees_l,
                                         lees_l_local, local_morans_i)

    adata = spatial_adata.copy()
    build_spatial_weights(adata, n_neighbors=6)
    with mock.patch.object(banded, "build_null_plan",
                           wraps=banded.build_null_plan) as spy:
        lees_l(adata, ("GENE0", "GENE1"), n_permutations=19, seed=0,
               use_existing_graph=True, null_method="banded")
        lees_l_local(adata, gene_pairs=("GENE0", "GENE1"),
                     n_permutations=19, seed=0, use_existing_graph=True,
                     null_method="banded", compute_cell_pvalues=True)
        local_morans_i(adata, genes=["GENE0"], n_permutations=19, seed=0,
                       use_existing_graph=True, null_method="banded")
        assert spy.call_count == 1, spy.call_count


def test_global_autocorrelation_fused_matches_separate(spatial_adata):
    """global_autocorrelation writes both uns tables, identical to the
    individual morans_i/gearys_c banded calls (same seed => same draws)."""
    import spatialcore_tpu as sct

    a_f = spatial_adata.copy()
    a_m = spatial_adata.copy()
    a_g = spatial_adata.copy()
    a_f = sct.spatial.global_autocorrelation(
        a_f, n_permutations=99, seed=0, null_method="banded")
    a_m = sct.spatial.morans_i(a_m, n_permutations=99, seed=0,
                               null_method="banded")
    a_g = sct.spatial.gearys_c(a_g, n_permutations=99, seed=0,
                               null_method="banded")
    dfm_f = a_f.uns["morans_i"].set_index("gene")
    dfg_f = a_f.uns["gearys_c"].set_index("gene")
    dfm = a_m.uns["morans_i"].set_index("gene")
    dfg = a_g.uns["gearys_c"].set_index("gene")
    pd.testing.assert_frame_equal(dfm_f, dfm)
    pd.testing.assert_frame_equal(dfg_f, dfg)
    ops = a_f.uns["spatialcore_metadata"]["operations"]
    assert ops[-1]["function"] == "global_autocorrelation"


def test_global_autocorrelation_slots_fallback(spatial_adata):
    """Below the banded threshold with null_method='auto', the fused call
    falls back to the slot kernel per statistic — matching the individual
    calls there too."""
    import spatialcore_tpu as sct

    a_f = spatial_adata.copy()
    a_m = spatial_adata.copy()
    a_f = sct.spatial.global_autocorrelation(a_f, n_permutations=49, seed=3)
    a_m = sct.spatial.morans_i(a_m, n_permutations=49, seed=3)
    pd.testing.assert_frame_equal(
        a_f.uns["morans_i"].set_index("gene"),
        a_m.uns["morans_i"].set_index("gene"))
    assert set(a_f.uns["gearys_c"].columns) == {
        "gene", "C", "expected_C", "z_score", "p_value"}


def test_global_autocorrelation_analytic(spatial_adata):
    """n_permutations=0: analytic tails, one-sided per statistic default."""
    import spatialcore_tpu as sct

    a = sct.spatial.global_autocorrelation(
        spatial_adata.copy(), n_permutations=0)
    dfm = a.uns["morans_i"].set_index("gene")
    dfg = a.uns["gearys_c"].set_index("gene")
    assert dfm.loc["GENE0", "p_value"] <= 0.01
    assert dfg.loc["GENE0", "p_value"] <= 0.01
    assert dfg.loc["GENE0", "C"] < 1.0


def test_local_morans_compact_output_mode(spatial_adata):
    """output_mode="compact" routes through the streaming driver: p and
    quadrant match the full banded_int8 run; z/lag are dropped and I is
    compact; params record the mode."""
    from spatialcore_tpu.spatial import local_morans_i

    adata = spatial_adata.copy()
    genes = list(adata.var_names[:8])
    full = local_morans_i(adata.copy(), genes=genes, n_neighbors=6,
                          n_permutations=19, seed=4,
                          null_method="banded_int8",
                          key_added="lm_full")
    comp = local_morans_i(adata.copy(), genes=genes, n_neighbors=6,
                          n_permutations=19, seed=4,
                          null_method="banded_int8",
                          output_mode="compact", key_added="lm_c")
    np.testing.assert_array_equal(
        np.asarray(comp.obsm["lm_c_p"], np.float32),
        np.asarray(full.obsm["lm_full_p"], np.float32))
    np.testing.assert_array_equal(np.asarray(comp.obsm["lm_c_quadrant"]),
                                  np.asarray(full.obsm["lm_full_quadrant"]))
    np.testing.assert_allclose(np.asarray(comp.obsm["lm_c_I"], np.float32),
                               np.asarray(full.obsm["lm_full_I"]),
                               rtol=1e-5, atol=1e-6)
    assert "lm_c_z" not in comp.obsm and "lm_c_lag" not in comp.obsm
    assert comp.uns["lm_c_params"]["output_mode"] == "compact"
    # host input -> host arrays
    assert isinstance(comp.obsm["lm_c_p"], np.ndarray)


def test_local_morans_compact_validation(spatial_adata):
    from spatialcore_tpu.spatial import local_morans_i

    with pytest.raises(ValueError, match="compact"):
        local_morans_i(spatial_adata.copy(),
                       genes=list(spatial_adata.var_names[:4]),
                       n_permutations=0, output_mode="compact")
    with pytest.raises(ValueError, match="output_mode"):
        local_morans_i(spatial_adata.copy(),
                       genes=list(spatial_adata.var_names[:4]),
                       output_mode="bogus")


def test_local_geary_compact_output_mode(spatial_adata):
    """VERDICT r4 item 1: output_mode="compact" on local_gearys_c routes
    through the streaming driver — p bitwise vs the full banded run, C
    close (bf16 cast), params record the mode."""
    from spatialcore_tpu.spatial import local_gearys_c

    adata = spatial_adata.copy()
    genes = list(adata.var_names[:8])
    kw = dict(genes=genes, n_neighbors=6, n_permutations=19, seed=4,
              null="total", null_method="banded_int8")
    full = local_gearys_c(adata.copy(), key_added="lg_full", **kw)
    comp = local_gearys_c(adata.copy(), key_added="lg_c",
                          output_mode="compact", **kw)
    np.testing.assert_array_equal(
        np.asarray(comp.obsm["lg_c_p"], np.float32),
        np.asarray(full.obsm["lg_full_p"], np.float32))
    np.testing.assert_allclose(
        np.asarray(comp.obsm["lg_c_C"], np.float32),
        np.asarray(full.obsm["lg_full_C"]), rtol=1e-2, atol=1e-2)
    # p_adj: f16 compact cast of the same discrete-BH values
    np.testing.assert_allclose(
        np.asarray(comp.obsm["lg_c_p_adj"], np.float32),
        np.asarray(full.obsm["lg_full_p_adj"]), rtol=2e-3, atol=2e-3)
    assert comp.uns["lg_c_params"]["output_mode"] == "compact"
    assert isinstance(comp.obsm["lg_c_p"], np.ndarray)  # host input

    with pytest.raises(ValueError, match="compact"):
        local_gearys_c(adata.copy(), genes=genes, n_permutations=0,
                       output_mode="compact")
    with pytest.raises(ValueError, match="output_mode"):
        local_gearys_c(adata.copy(), genes=genes, output_mode="bogus")


def test_getis_compact_output_mode(spatial_adata):
    """VERDICT r4 item 1: output_mode="compact" on getis_ord_gi — p_sim
    bitwise vs the full banded run, hotspot identical, G/z close."""
    from spatialcore_tpu.spatial import getis_ord_gi

    adata = spatial_adata.copy()
    genes = list(adata.var_names[:8])
    kw = dict(genes=genes, n_neighbors=6, n_permutations=19, seed=4,
              null_method="banded_int8")
    full = getis_ord_gi(adata.copy(), key_added="go_full", **kw)
    comp = getis_ord_gi(adata.copy(), key_added="go_c",
                        output_mode="compact", **kw)
    np.testing.assert_array_equal(
        np.asarray(comp.obsm["go_c_p_sim"], np.float32),
        np.asarray(full.obsm["go_full_p_sim"], np.float32))
    np.testing.assert_array_equal(np.asarray(comp.obsm["go_c_hotspot"]),
                                  np.asarray(full.obsm["go_full_hotspot"]))
    np.testing.assert_allclose(
        np.asarray(comp.obsm["go_c_G"], np.float32),
        np.asarray(full.obsm["go_full_G"]), rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(comp.obsm["go_c_z"], np.float32),
        np.asarray(full.obsm["go_full_z"]), rtol=1e-2, atol=2e-2)
    assert comp.uns["go_c_params"]["output_mode"] == "compact"

    with pytest.raises(ValueError, match="compact"):
        getis_ord_gi(adata.copy(), genes=genes, n_permutations=0,
                     output_mode="compact")


def test_lees_l_local_compact_output_mode(spatial_adata):
    """VERDICT r4 item 1: output_mode="compact" on lees_l_local writes
    [N, n_pairs] obsm planes; p bitwise vs the full banded per-cell
    p-values; L matches the obs columns."""
    from spatialcore_tpu.ops.fdr import apply_fdr
    from spatialcore_tpu.spatial import lees_l_local

    adata = spatial_adata.copy()
    pairs = [("GENE0", "GENE1"), ("GENE2", "GENE3"), ("GENE0", "GENE4")]
    full = lees_l_local(adata.copy(), gene_pairs=pairs, n_neighbors=6,
                        n_permutations=19, seed=4,
                        compute_cell_pvalues=True,
                        null_method="banded_int8")
    comp = lees_l_local(adata.copy(), gene_pairs=pairs, n_neighbors=6,
                        n_permutations=19, seed=4,
                        null_method="banded_int8", output_mode="compact",
                        key_added="ll_c")
    assert comp.obsm["ll_c_L"].shape == (adata.n_obs, len(pairs))
    p_full = np.stack([np.asarray(full.obs[f"{gx}_{gy}_pvalue"])
                       for gx, gy in pairs], axis=1)
    np.testing.assert_array_equal(
        np.asarray(comp.obsm["ll_c_p"], np.float32), p_full)
    L_full = np.stack([np.asarray(full.obs[f"{gx}_{gy}_lees_l"])
                       for gx, gy in pairs], axis=1)
    np.testing.assert_allclose(
        np.asarray(comp.obsm["ll_c_L"], np.float32), L_full,
        rtol=1e-2, atol=1e-2)
    p_adj_ref = np.asarray(apply_fdr(jnp.asarray(p_full), "fdr_bh",
                                     axis=0, n_levels=20))
    np.testing.assert_allclose(
        np.asarray(comp.obsm["ll_c_p_adj"], np.float32), p_adj_ref,
        rtol=2e-3, atol=2e-3)
    assert comp.uns["ll_c_params"]["output_mode"] == "compact"
    assert comp.uns["ll_c_params"]["pairs"] == [list(p) for p in pairs]

    with pytest.raises(ValueError, match="compact"):
        lees_l_local(adata.copy(), gene_pairs=pairs, n_permutations=0,
                     output_mode="compact")


def test_getis_streaming_hotspot_matches_public(spatial_adata):
    """The streaming getis hotspot plane (new key) equals the public
    full-mode hotspot for both host-sink and lean-keys paths."""
    from spatialcore_tpu.ops.banded import build_null_plan
    from spatialcore_tpu.ops.graph import build_graph
    from spatialcore_tpu.ops.streaming import (
        device_local_sink, host_local_sink, streaming_local_null)
    from spatialcore_tpu.spatial import getis_ord_gi

    adata = spatial_adata.copy()
    genes = list(adata.var_names)
    full = getis_ord_gi(adata.copy(), genes=genes, n_neighbors=6,
                        n_permutations=19, seed=3,
                        null_method="banded_int8", key_added="go")
    X = np.asarray(adata.X, np.float32)
    coords = np.asarray(adata.obsm["spatial"], np.float32)
    graph = build_graph(coords, n_neighbors=6)
    plan = build_null_plan(graph, coords, block=64)
    # default path (host sink, all keys incl. hotspot)
    sink, store = host_local_sink(*X.shape)
    streaming_local_null(graph, plan, lambda s, w: X[:, s:s + w],
                         X.shape[1], sink, stat="getis", seed=3,
                         n_permutations=19, tile=4)
    np.testing.assert_array_equal(store["hotspot"],
                                  np.asarray(full.obsm["go_hotspot"]))
    # lean path (keys=..., fused post-pass)
    sink2, fin2 = device_local_sink(X.shape[1], keys=("hotspot",))
    streaming_local_null(graph, plan, lambda s, w: X[:, s:s + w],
                         X.shape[1], sink2, stat="getis", seed=3,
                         n_permutations=19, tile=4, keys=("hotspot",),
                         post_chunk=2)
    np.testing.assert_array_equal(np.asarray(fin2()["hotspot"]),
                                  np.asarray(full.obsm["go_hotspot"]))


def test_auto_null_method_volume_gate():
    """auto = banded only at >=100k cells AND genes*perms >= 16,384 —
    small panels take the slot path whose per-draw gathers beat the
    banded plan-build + compile (round-5 config-2 finding)."""
    from spatialcore_tpu.spatial.autocorrelation import _auto_null_method

    assert _auto_null_method(1_000_000, 64, 1000) == "banded"
    assert _auto_null_method(100_000, 960, 99) == "banded"     # config 9
    assert _auto_null_method(100_000, 8, 99) == "slots"        # config 2
    assert _auto_null_method(50_000, 8192, 1000) == "slots"    # small N
    assert _auto_null_method(1_000_000, 8, 0) == "slots"       # analytic
    # exact boundary: 16,384 gene*perms qualifies, one fewer does not
    assert _auto_null_method(100_000, 128, 128) == "banded"
    assert _auto_null_method(100_000, 127, 128) == "slots"
