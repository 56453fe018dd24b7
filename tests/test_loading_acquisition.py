"""Backed loading, stratified sampling, acquisition, discovery."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation import (
    acquire_reference, discover_training_data, load_adata_backed,
    make_metadata_template, query_metadata, resolve_uri_to_local,
    stratified_sample_indices)

from conftest import make_adata


def _write_ref(tmp_path, n=500, seed=0, name="ref.h5ad"):
    rng = np.random.default_rng(seed)
    adata = make_adata(n_obs=n, n_vars=12, sparse=True, seed=seed)
    adata.obs["cell_type"] = rng.choice(["A", "B", "C"], n, p=[0.6, 0.3, 0.1])
    p = tmp_path / name
    sct.write_h5ad(adata, p)
    return p, adata


def test_stratified_sample_proportions():
    labels = np.array(["A"] * 600 + ["B"] * 300 + ["C"] * 100)
    idx = stratified_sample_indices(labels, 200, seed=0)
    assert idx.size == 200
    frac_a = (labels[idx] == "A").mean()
    assert 0.5 < frac_a < 0.7
    assert (labels[idx] == "C").sum() >= 1
    # deterministic
    idx2 = stratified_sample_indices(labels, 200, seed=0)
    np.testing.assert_array_equal(idx, idx2)


def test_load_adata_backed_samples_rows(tmp_path):
    p, full = _write_ref(tmp_path)
    # force the backed path with a tiny threshold
    sub = load_adata_backed(p, max_cells=120, stratify_by="cell_type",
                            backed_threshold_bytes=0, seed=0)
    assert sub.n_obs == 120
    assert sub.n_vars == full.n_vars
    # sampled rows carry consistent X and obs
    full_X = np.asarray(full.X.todense())
    sub_X = np.asarray(sub.X.todense())
    lookup = {n: i for i, n in enumerate(full.obs_names)}
    for i, name in enumerate(sub.obs_names[:20]):
        np.testing.assert_allclose(sub_X[i], full_X[lookup[name]])
    # stratification: all three types present
    assert sub.obs["cell_type"].nunique() == 3


def test_load_adata_backed_small_file_loads_fully(tmp_path):
    p, full = _write_ref(tmp_path)
    adata = load_adata_backed(p)
    assert adata.n_obs == full.n_obs


def test_acquire_reference_local_and_cache(tmp_path):
    p, _ = _write_ref(tmp_path)
    out = tmp_path / "out" / "copy.h5ad"
    got = acquire_reference(str(p), out)
    assert got.exists() and got.stat().st_size == p.stat().st_size
    # skip when exists
    got2 = acquire_reference(str(p), out)
    assert got2 == out
    assert resolve_uri_to_local(f"file://{p}") == p
    with pytest.raises(FileNotFoundError):
        resolve_uri_to_local(str(tmp_path / "missing.h5ad"))
    with pytest.raises(ValueError, match="Unknown URI scheme"):
        resolve_uri_to_local("weird://thing")


def test_gated_cloud_schemes_raise_helpfully(tmp_path):
    have_gcsfs = True
    try:
        import gcsfs  # noqa: F401
    except ImportError:
        have_gcsfs = False
    if not have_gcsfs:
        with pytest.raises(ImportError, match="gcsfs"):
            resolve_uri_to_local("gs://bucket/thing.h5ad",
                                 cache_dir=tmp_path)
    try:
        import cellxgene_census  # noqa: F401
    except ImportError:
        from spatialcore_tpu.annotation.cellxgene import (
            query_cellxgene_census)

        with pytest.raises(ImportError, match="cellxgene"):
            query_cellxgene_census(tissue="lung",
                                   output_path=tmp_path / "x.h5ad")


def test_discovery_and_metadata_roundtrip(tmp_path):
    _write_ref(tmp_path, name="a.h5ad")
    _write_ref(tmp_path, name="b.h5ad", seed=1)
    (tmp_path / "nested").mkdir()
    _write_ref(tmp_path / "nested", name="c.h5ad", seed=2)
    found = discover_training_data(tmp_path)
    assert {d.name for d in found} == {"a", "b", "c"}
    assert all(d.size_gb is not None for d in found)

    df = make_metadata_template(found, tmp_path / "meta.csv")
    df.loc[df["name"] == "b", "include"] = False
    df.loc[df["name"] == "a", "tissue"] = "lung"
    df.to_csv(tmp_path / "meta.csv", index=False)
    q = query_metadata(tmp_path / "meta.csv")
    assert set(q["name"]) == {"a", "c"}
    q2 = query_metadata(tmp_path / "meta.csv", tissue="lung")
    assert list(q2["name"]) == ["a"]
