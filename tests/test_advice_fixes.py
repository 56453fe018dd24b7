"""Regression tests for round-1 advisor findings (ADVICE.md)."""

import h5py
import numpy as np
import pandas as pd
import pytest

from spatialcore_tpu.core.container import SpatialData
from spatialcore_tpu.core.io import read_h5ad, write_h5ad


def _toy_adata(n=150, g=8, seed=0):
    rng = np.random.default_rng(seed)
    ad = SpatialData(
        X=rng.poisson(2.0, (n, g)).astype(np.float32),
        obs=pd.DataFrame({"cell_type": pd.Categorical(
            rng.choice(["A", "B"], n))},
            index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=[f"G{i}" for i in range(g)]),
    )
    ad.obsm["spatial"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    return ad


# ---------------------------------------------------------------------------
# ADVICE medium: anndata >=0.8 encoding versions
# ---------------------------------------------------------------------------

# the (type, version) pairs anndata >= 0.8 registers readers for
_REGISTERED = {
    "anndata": "0.1.0", "array": "0.2.0", "string-array": "0.2.0",
    "string": "0.2.0", "numeric-scalar": "0.2.0", "dataframe": "0.2.0",
    "categorical": "0.2.0", "dict": "0.1.0", "csr_matrix": "0.1.0",
    "csc_matrix": "0.1.0", "raw": "0.1.0",
}


def test_h5ad_encoding_versions_match_anndata_registry(tmp_path):
    import scipy.sparse as sp

    from spatialcore_tpu.core.container import Raw

    ad = _toy_adata()
    ad.layers["counts"] = sp.csr_matrix(ad.X)
    ad.uns["note"] = "hello"
    ad.uns["flag"] = True
    ad.uns["nested"] = {"alpha": np.arange(3), "beta": 1.5}
    ad.raw = Raw(ad.X.copy(), ad.var.copy(), ad.obs_names)
    path = tmp_path / "enc.h5ad"
    write_h5ad(ad, path)

    problems = []

    def visit(name, obj):
        enc = obj.attrs.get("encoding-type")
        ver = obj.attrs.get("encoding-version")
        if enc is None:
            return
        enc = enc if isinstance(enc, str) else enc.decode()
        ver = ver if isinstance(ver, str) else ver.decode()
        if enc not in _REGISTERED or _REGISTERED[enc] != ver:
            problems.append((name, enc, ver))

    with h5py.File(path, "r") as f:
        visit("/", f)
        f.visititems(visit)
        # raw group must be typed 'raw', not 'dict'
        assert f["raw"].attrs["encoding-type"] in ("raw", b"raw")
        # booleans are native HDF5 bools, not uint8 + private attr
        assert f["uns/flag"].dtype == np.bool_
    assert not problems, f"unregistered encodings: {problems}"

    back = read_h5ad(path)
    assert back.uns["flag"] is True
    assert back.uns["note"] == "hello"
    np.testing.assert_allclose(
        np.asarray(back.layers["counts"].todense()), ad.X)


# ---------------------------------------------------------------------------
# ADVICE low: radius-mode k_max clamp on small datasets
# ---------------------------------------------------------------------------

def test_radius_neighbors_kmax_clamped_to_n():
    from spatialcore_tpu.ops.graph import radius_neighbors

    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 100, (100, 2)).astype(np.float32)
    # k_max=256 > n=100 used to raise "k must be < n_cells"
    idx, dist, valid = radius_neighbors(coords, radius=15.0, k_max=256)
    assert idx.shape[0] == 100 and idx.shape[1] <= 99
    assert bool(valid.any())


def test_radius_overflow_still_detected():
    from spatialcore_tpu.ops.graph import radius_neighbors

    rng = np.random.default_rng(2)
    coords = rng.uniform(0, 10, (500, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="more than k_max"):
        radius_neighbors(coords, radius=9.0, k_max=8)


def test_neighborhood_profile_radius_small_dataset():
    from spatialcore_tpu.spatial import compute_neighborhood_profile

    ad = _toy_adata(n=120)
    compute_neighborhood_profile(ad, celltype_column="cell_type",
                                 method="radius", radius=30.0)
    assert "neighborhood_profile" in ad.obsm


# ---------------------------------------------------------------------------
# ADVICE low: stored-graph parameter mismatch must rebuild, not silently reuse
# ---------------------------------------------------------------------------

def test_stored_graph_param_mismatch_rebuilds():
    from spatialcore_tpu.spatial.autocorrelation import (
        _get_graph, build_spatial_weights)

    ad = _toy_adata()
    build_spatial_weights(ad, n_neighbors=4)
    g_cached = _get_graph(ad, 4, "spatial", use_existing_graph=True)
    assert g_cached.degree == 4
    # requesting different n_neighbors must NOT silently reuse the k=4 graph
    g_new = _get_graph(ad, 8, "spatial", use_existing_graph=True)
    assert g_new.degree == 8


def test_stored_radius_graph_reused_for_default_request():
    from spatialcore_tpu.spatial.autocorrelation import (
        _get_graph, build_spatial_weights)

    ad = _toy_adata()
    build_spatial_weights(ad, radius=25.0, k_max=64)
    g = _get_graph(ad, 6, "spatial", use_existing_graph=True)
    # radius graphs are deliberate; a default kNN request reuses them
    assert not bool(np.asarray(g.valid).all()) or g.degree != 6


# ---------------------------------------------------------------------------
# Round-2 advisor findings (ADVICE.md round 2)
# ---------------------------------------------------------------------------

def test_local_join_counts_categorical_column():
    from spatialcore_tpu.spatial import local_join_counts

    ad = _toy_adata(n=200)
    # categorical string column with category= escape hatch (round-2 fix:
    # previously hit raw.astype(float) -> opaque ValueError)
    local_join_counts(ad, "cell_type", category="A", n_permutations=19)
    assert "cell_type_local_jc_BB" in ad.obs
    assert "cell_type_local_jc_p" in ad.obs


def test_local_join_counts_categorical_without_category_raises():
    from spatialcore_tpu.spatial import local_join_counts

    ad = _toy_adata(n=200)
    with pytest.raises(ValueError, match="category"):
        local_join_counts(ad, "cell_type", n_permutations=9)


def test_local_join_counts_numeric_and_bool_columns():
    from spatialcore_tpu.spatial import local_join_counts

    ad = _toy_adata(n=200)
    rng = np.random.default_rng(3)
    ad.obs["flag"] = rng.random(200) > 0.5
    ad.obs["score"] = (rng.random(200) - 0.5).astype(np.float32)
    local_join_counts(ad, "flag", n_permutations=19)
    local_join_counts(ad, "score", n_permutations=19)
    assert "flag_local_jc_BB" in ad.obs
    assert "score_local_jc_BB" in ad.obs


def test_getis_p_sim_respects_alternative():
    import jax.numpy as jnp

    from spatialcore_tpu.ops.getis import getis_ord
    from spatialcore_tpu.ops.graph import build_graph

    rng = np.random.default_rng(4)
    coords = rng.uniform(0, 100, (300, 2)).astype(np.float32)
    # a strong hot spot: elevated values in one corner
    x = rng.normal(0, 1, 300).astype(np.float32)
    hot = (coords[:, 0] < 25) & (coords[:, 1] < 25)
    x[hot] += 4.0
    graph = build_graph(jnp.asarray(coords), n_neighbors=6)
    rg = getis_ord(graph, jnp.asarray(x), alternative="greater",
                   n_permutations=99, seed=0)
    rl = getis_ord(graph, jnp.asarray(x), alternative="less",
                   n_permutations=99, seed=0)
    rt = getis_ord(graph, jnp.asarray(x), alternative="two-sided",
                   n_permutations=99, seed=0)
    z = np.asarray(rg.z_score)[:, 0]
    pg = np.asarray(rg.p_sim)[:, 0]
    pl = np.asarray(rl.p_sim)[:, 0]
    pt = np.asarray(rt.p_sim)[:, 0]
    top = int(np.argmax(z))          # strongest hot cell
    bot = int(np.argmin(z))          # strongest cold cell
    # one-sided 'greater' flags the hot cell, not the cold one
    assert pg[top] < 0.05 and pg[bot] > 0.5
    # one-sided 'less' flags the cold cell, not the hot one
    assert pl[bot] < 0.05 and pl[top] > 0.5
    # two-sided flags both
    assert pt[top] < 0.1 and pt[bot] < 0.1
    # for a strongly hot cell: one-sided p <= two-sided p
    assert pg[top] <= pt[top] + 1e-9
