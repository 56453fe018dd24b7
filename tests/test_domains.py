"""Domains, raster geometry, expression filters, and domain distances."""

import numpy as np
import pandas as pd
import pytest
import scipy.ndimage as ndi

from spatialcore_tpu.annotation.expression import (
    evaluate_ontology_expression, tokenize)
from spatialcore_tpu.ops.geometry import (
    _BG, connected_components, dilate, disk_kernel, erode)
from spatialcore_tpu.spatial import (
    calculate_domain_distances, detect_platform, get_distance_matrix,
    get_domain_summary, make_spatial_domains)

from conftest import make_adata

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# geometry kernels vs scipy.ndimage
# ---------------------------------------------------------------------------

def test_dilate_erode_match_scipy():
    rng = np.random.default_rng(0)
    mask = np.zeros((64, 64), bool)
    pts = rng.integers(5, 59, size=(25, 2))
    mask[pts[:, 0], pts[:, 1]] = True
    for r in (1, 3, 5):
        disk = disk_kernel(r).astype(bool)
        want_d = ndi.binary_dilation(mask, structure=disk)
        got_d = np.asarray(dilate(jnp.asarray(mask), r))
        np.testing.assert_array_equal(got_d, want_d)
        want_e = ndi.binary_erosion(want_d, structure=disk)
        got_e = np.asarray(erode(jnp.asarray(got_d), r))
        np.testing.assert_array_equal(got_e, want_e)


def test_connected_components_match_scipy():
    rng = np.random.default_rng(1)
    mask = ndi.binary_dilation(
        rng.random((128, 128)) > 0.97, iterations=3)
    got = np.asarray(connected_components(jnp.asarray(mask)))
    want, n_want = ndi.label(mask, structure=np.ones((3, 3)))
    # same partition: bijection between our ids and scipy's
    got_ids = got[mask]
    want_ids = want[mask]
    pairs = set(zip(got_ids.tolist(), want_ids.tolist()))
    assert len(pairs) == n_want
    assert len({g for g, _ in pairs}) == n_want
    assert len({w for _, w in pairs}) == n_want
    assert (got[~mask] == int(_BG)).all()


# ---------------------------------------------------------------------------
# ontology expression
# ---------------------------------------------------------------------------

def _onto_adata():
    adata = make_adata(n_obs=100, n_vars=5)
    adata.obs["cell_type_ontology_id"] = (
        ["CL:0000236"] * 30 + ["CL:0000624"] * 30 + ["CL:0000235"] * 40)
    adata.obs["is_tumor"] = [True] * 50 + [False] * 50
    return adata


def test_expression_single_and_compound():
    adata = _onto_adata()
    m = evaluate_ontology_expression("CL:0000236", adata)
    assert m.sum() == 30
    m = evaluate_ontology_expression("CL:0000236 | CL:0000624", adata)
    assert m.sum() == 60
    m = evaluate_ontology_expression("~CL:0000235", adata)
    assert m.sum() == 60
    m = evaluate_ontology_expression("(CL:0000236 | CL:0000624) & ~CL:0000624",
                                     adata)
    assert m.sum() == 30


def test_expression_mixed_boolean_column():
    adata = _onto_adata()
    m = evaluate_ontology_expression("CL:0000236 & is_tumor", adata)
    assert m.sum() == 30  # first 30 are both B cells and tumor
    m = evaluate_ontology_expression("CL:0000624 & is_tumor", adata)
    assert m.sum() == 20


def test_expression_errors():
    adata = _onto_adata()
    with pytest.raises(ValueError, match="neither"):
        evaluate_ontology_expression("CL:9999999 | nope_col", adata)
    with pytest.raises(ValueError, match="parenthesis|Unexpected"):
        evaluate_ontology_expression("(CL:0000236", adata)
    assert tokenize("A:1&(B:2|~C:3)") == ["A:1", "&", "(", "B:2", "|", "~",
                                          "C:3", ")"]


def test_platform_detection():
    assert detect_platform(np.array([[100.0, 90000.0]])) == "cosmx"
    assert detect_platform(np.array([[100.0, 9000.0]])) == "xenium"
    assert detect_platform(np.array([[100.0, 30000.0]])) == "visium"


# ---------------------------------------------------------------------------
# make_spatial_domains end-to-end
# ---------------------------------------------------------------------------

def _two_cluster_adata(n_bg=300, seed=0):
    """Two dense B-cell blobs + scattered background cells (Xenium scale)."""
    rng = np.random.default_rng(seed)
    blob1 = rng.normal([1000, 1000], 60, size=(120, 2))
    blob2 = rng.normal([3000, 2500], 60, size=(80, 2))
    bg = rng.uniform(0, 4000, size=(n_bg, 2))
    coords = np.vstack([blob1, blob2, bg]).astype(np.float32)
    n = coords.shape[0]
    adata = make_adata(n_obs=n, n_vars=5, with_spatial=False)
    adata.obsm["spatial"] = coords
    is_b = np.zeros(n, bool)
    is_b[:200] = True
    adata.obs["cell_type"] = np.where(is_b, "B cell", "Other")
    adata.obs["cell_type_ontology_id"] = np.where(
        is_b, "CL:0000236", "CL:0000000")
    return adata, is_b


def test_make_spatial_domains_two_blobs():
    adata, is_b = _two_cluster_adata()
    adata = make_spatial_domains(
        adata, "cell_type == 'B cell'", platform="xenium",
        min_target_cells_domain=10)
    dom = adata.obs["spatial_domain"]
    assert dom.notna().sum() > 0
    names = dom.dropna().unique().tolist()
    assert len(names) == 2
    # largest domain is _1 (blob1 has 120 target cells vs 80)
    blob1_dom = dom.iloc[:120].mode()[0]
    assert str(blob1_dom).endswith("_1")
    # virtually all blob cells assigned, to a single domain each
    assert dom.iloc[:120].notna().mean() > 0.95
    assert dom.iloc[120:200].notna().mean() > 0.95
    assert dom.iloc[120:200].mode()[0] != blob1_dom
    params = adata.uns["spatial_domain_params"]
    assert params["n_domains"] == 2
    assert params["platform"] == "xenium"
    # boundaries stored for both domains
    bounds = adata.uns["spatial_domain_boundaries"]
    assert set(bounds) == set(names)


def test_make_spatial_domains_ontology_filter_and_min_size():
    adata, is_b = _two_cluster_adata()
    adata = make_spatial_domains(
        adata, "CL:0000236", platform="xenium",
        min_target_cells_domain=100,  # only blob1 (120) survives
        output_column="bdom", domain_prefix="B")
    names = adata.obs["bdom"].dropna().unique().tolist()
    assert names == ["B_1"]
    assert adata.obs["bdom"].iloc[:120].notna().mean() > 0.95
    assert adata.obs["bdom"].iloc[120:200].isna().all()


def test_make_spatial_domains_target_only_assignment():
    adata, is_b = _two_cluster_adata()
    adata = make_spatial_domains(
        adata, "cell_type == 'B cell'", platform="xenium",
        assign_all_cells=False, output_column="strict")
    assigned = adata.obs["strict"].notna().to_numpy()
    assert not assigned[~is_b].any()


def test_make_spatial_domains_errors():
    adata, _ = _two_cluster_adata()
    with pytest.raises(ValueError, match="No cells match"):
        make_spatial_domains(adata, "cell_type == 'Zebra'",
                             platform="xenium")
    with pytest.raises(ValueError, match="filter_expression"):
        make_spatial_domains(adata, None, platform="xenium")
    with pytest.raises(ValueError, match="shrink_margin"):
        make_spatial_domains(adata, "CL:0000236", platform="xenium",
                             cell_dist_um=20.0, shrink_margin_um=25.0)
    summary = None
    with pytest.raises(KeyError):
        get_domain_summary(adata, "never_made")


# ---------------------------------------------------------------------------
# domain distances
# ---------------------------------------------------------------------------

def _domain_adata():
    """Three square domains at known offsets for exact distance checks."""
    rng = np.random.default_rng(2)
    a = rng.uniform([0, 0], [100, 100], (50, 2))
    b = rng.uniform([300, 0], [400, 100], (60, 2))
    c = rng.uniform([0, 500], [100, 600], (40, 2))
    coords = np.vstack([a, b, c]).astype(np.float32)
    adata = make_adata(n_obs=150, n_vars=4, with_spatial=False)
    adata.obsm["spatial"] = coords
    adata.obs["dom"] = pd.Categorical(
        ["A"] * 50 + ["B"] * 60 + ["C"] * 40)
    return adata, a, b, c


def _brute_min(u, v):
    return np.sqrt(((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)).min()


def _brute_mean(u, v):
    return np.sqrt(((u[:, None, :] - v[None, :, :]) ** 2).sum(-1)).mean()


def test_domain_distances_minimum_exact():
    adata, a, b, c = _domain_adata()
    adata = calculate_domain_distances(adata, "dom", "dom",
                                       distance_metric="minimum")
    mat = get_distance_matrix(adata)
    np.testing.assert_allclose(mat.loc["A", "B"], _brute_min(a, b), rtol=1e-5)
    np.testing.assert_allclose(mat.loc["A", "C"], _brute_min(a, c), rtol=1e-5)
    np.testing.assert_allclose(mat.loc["B", "C"], _brute_min(b, c), rtol=1e-5)
    assert mat.loc["A", "A"] == 0.0
    # per-cell: nearest non-self domain for an A cell at the right edge
    d = adata.obs["distance_to_target"]
    assert d.notna().all()
    assert (d == 0).all()  # same column as source → nearest is own domain


def test_domain_distances_mean_and_centroid():
    adata, a, b, c = _domain_adata()
    adata = calculate_domain_distances(
        adata, "dom", "dom", distance_metric="mean", output_mode="matrix")
    mat = get_distance_matrix(adata)
    np.testing.assert_allclose(mat.loc["A", "B"], _brute_mean(a, b),
                               rtol=1e-4)
    adata = calculate_domain_distances(
        adata, "dom", "dom", distance_metric="centroid",
        output_mode="matrix")
    mat = get_distance_matrix(adata)
    np.testing.assert_allclose(
        mat.loc["A", "C"],
        np.linalg.norm(a.mean(0) - c.mean(0)), rtol=1e-5)


def test_domain_distances_subset_and_cell_mode():
    adata, a, b, c = _domain_adata()
    adata = calculate_domain_distances(
        adata, "dom", "dom", source_domain_subset=["A"],
        target_domain_subset=["B", "C"], distance_metric="minimum")
    d = adata.obs["distance_to_target"].to_numpy()
    near = adata.obs["nearest_target_domain"]
    assert np.isnan(d[50:]).all()          # only A cells annotated
    assert near.iloc[:50].notna().all()
    # A is closer to B (dx=200) than C (dy=400)
    assert (near.iloc[:50] == "B").mean() > 0.9
    with pytest.raises(ValueError, match="not present"):
        calculate_domain_distances(adata, "dom", "dom",
                                   source_domain_subset=["Z"])


def test_domain_polygon_chains():
    """Marching-squares polygons: ordered, closed, enclosing the domain
    cells (ROADMAP item 10)."""
    import spatialcore_tpu as sct

    rng = np.random.default_rng(3)
    n = 3000
    blob = rng.normal([300, 300], 40, (n // 3, 2))
    rest = rng.uniform(0, 1000, (n - n // 3, 2))
    coords = np.vstack([blob, rest]).astype(np.float32)
    adata = sct.SpatialData(X=np.ones((n, 2), np.float32))
    adata.obsm["spatial"] = coords
    adata.obs["is_b"] = np.concatenate(
        [np.ones(n // 3, bool), np.zeros(n - n // 3, bool)])
    adata = sct.spatial.make_spatial_domains(
        adata, filter_expression="is_b", platform="xenium",
        cell_dist_um=40.0, domain_prefix="bzone")
    polys = adata.uns["spatial_domain_polygons"]
    assert polys, "no polygons stored"
    name, arr = next(iter(polys.items()))
    assert arr.ndim == 2 and arr.shape[1] == 2
    # loops are NaN-separated and each loop is closed
    nan_rows = np.isnan(arr[:, 0])
    segs = np.split(arr, np.nonzero(nan_rows)[0])
    closed = 0
    for s in segs:
        s = s[~np.isnan(s[:, 0])]
        if len(s) >= 4 and np.allclose(s[0], s[-1]):
            closed += 1
    assert closed >= 1
    # the largest loop encloses most of the domain's cells (bbox check)
    main = max((s[~np.isnan(s[:, 0])] for s in segs), key=len)
    col = adata.obs["spatial_domain"]
    in_domain = col.notna()
    pts = coords[np.asarray(in_domain)]
    frac = ((pts[:, 0] >= main[:, 0].min()) & (pts[:, 0] <= main[:, 0].max())
            & (pts[:, 1] >= main[:, 1].min())
            & (pts[:, 1] <= main[:, 1].max())).mean()
    assert frac > 0.9


def test_categorical_true_false_filter_not_all_true():
    """h5ad loads string obs as Categorical: 'False' cells must NOT be
    selected (numpy string truthiness made the filter all-True)."""
    import pandas as pd

    import scipy.sparse as sp

    import spatialcore_tpu as sct
    from spatialcore_tpu.spatial.domains import _evaluate_filter_expression

    rng = np.random.default_rng(0)
    n = 500
    a = sct.SpatialData(X=sp.csr_matrix(
        rng.poisson(1, (n, 3)).astype(np.float32)))
    a.obsm["spatial"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    truth = rng.uniform(size=n) < 0.3
    a.obs["flag"] = pd.Categorical(np.where(truth, "True", "False"))
    m = _evaluate_filter_expression("flag", a)
    assert (m.to_numpy() == truth).all()


def test_curie_equality_expression_routes_to_equality():
    """\"col == 'CL:...'\" is documented equality syntax — must not be
    hijacked by the ontology-expression route (crashed on '=')."""
    import scipy.sparse as sp

    import spatialcore_tpu as sct
    from spatialcore_tpu.spatial.domains import _evaluate_filter_expression

    rng = np.random.default_rng(1)
    n = 300
    a = sct.SpatialData(X=sp.csr_matrix(
        rng.poisson(1, (n, 3)).astype(np.float32)))
    a.obsm["spatial"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    ids = np.where(rng.uniform(size=n) < 0.5, "CL:0000084", "CL:0000236")
    a.obs["cell_type_ontology_term_id"] = ids
    m = _evaluate_filter_expression(
        "cell_type_ontology_term_id == 'CL:0000084'", a)
    assert (m.to_numpy() == (ids == "CL:0000084")).all()


def test_erode_border_is_background():
    """Erosion must shrink masks at the image border (outside counts as
    background, not foreground)."""
    import jax.numpy as jnp

    from spatialcore_tpu.ops.geometry import erode

    m = jnp.ones((10, 10), bool)
    e = np.asarray(erode(m, 2))
    assert e[2:-2, 2:-2].all()
    assert not e[0].any() and not e[:, 0].any()
    assert not e[-1].any() and not e[:, -1].any()
