"""Dual-threshold marker validation, decision-score extraction, 2D plot."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation import (
    extract_decision_scores, filter_by_marker_validation)

from conftest import make_adata


def _marker_world(n_per=300, seed=0):
    """B cells express MS4A1/CD79A; half the 'B cell' calls are fake."""
    rng = np.random.default_rng(seed)
    n = n_per * 2
    genes = ["MS4A1", "CD79A", "CD3D", "TRAC", "OTHER"]
    X = rng.gamma(1.0, 0.3, (n, len(genes))).astype(np.float32)
    # first half: true B cells with real marker expression
    X[:n_per, 0] += rng.gamma(6, 1.0, n_per)
    X[:n_per, 1] += rng.gamma(6, 1.0, n_per)
    adata = make_adata(n_obs=n, n_vars=len(genes))
    adata.X = sp.csr_matrix(X)
    adata.var_names = pd.Index(genes)
    adata.obs["cell_type"] = "B cell"
    # fake calls get low confidence; true ones high
    adata.obs["cell_type_confidence"] = np.concatenate(
        [rng.uniform(0.85, 1.0, n_per), rng.uniform(0.2, 0.5, n_per)])
    return adata, n_per


def test_filter_by_marker_validation_relabels_fakes():
    adata, n_per = _marker_world()
    adata = filter_by_marker_validation(
        adata, confidence_threshold=0.8, marker_probability_threshold=0.3,
        min_cells_per_type=100, seed=0)
    labels = adata.obs["cell_type"].astype(str).to_numpy()
    # true B cells survive; most fakes (low conf AND low marker) relabeled
    assert (labels[:n_per] == "B cell").mean() > 0.95
    assert (labels[n_per:] == "Unassigned").mean() > 0.6


def test_extract_decision_scores_roundtrip():
    adata = make_adata(n_obs=50, n_vars=3)
    scores = np.random.default_rng(0).normal(size=(50, 4)).astype(np.float32)
    adata.obsm["cell_type_decision_scores"] = scores
    adata.uns["cell_type_decision_scores_classes"] = ["a", "b", "c", "d"]
    got, classes = extract_decision_scores(adata)
    np.testing.assert_array_equal(got, scores)
    assert classes == ["a", "b", "c", "d"]
    adata.uns["cell_type_decision_scores_classes"] = ["a"]
    with pytest.raises(ValueError, match="columns"):
        extract_decision_scores(adata)
    with pytest.raises(KeyError):
        extract_decision_scores(make_adata(n_obs=5, n_vars=2))


def test_plot_2d_validation_summary(tmp_path):
    from spatialcore_tpu.plotting.validation import plot_2d_validation

    adata, n_per = _marker_world(seed=1)
    fig, summary = plot_2d_validation(
        adata, min_cells=50, path=tmp_path / "v2d.png")
    assert (tmp_path / "v2d.png").exists()
    assert summary.iloc[0]["cell_type"] == "B cell"
    assert 30 <= summary.iloc[0]["pct_pass"] <= 90  # half the calls are fake
