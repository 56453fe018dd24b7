"""Annotation quality benchmark metrics (annotation/benchmark.py).

The reference publishes these seven metrics only as a finished docs
table (/root/reference/docs/celltyping/benchmarks.md "Results"); here
they are package functions, so the tests pin the *discriminative*
property the reference relies on: a correct annotation must beat a
label-shuffled one on every marker-based metric.
"""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation.benchmark import (
    SUMMARY_METRICS,
    benchmark_annotation,
    compare_annotation_methods,
    deg_log2fc,
    gene_overlap,
    marker_quality_metrics,
    unassigned_rate,
)

MARKERS = {
    "alpha": ["GA0", "GA1", "GA2"],
    "beta": ["GB0", "GB1", "GB2"],
    "gamma": ["GC0", "GC1", "GC2"],
}


def _mixture(n_per=120, noise_genes=6, seed=0, marker_rate=6.0,
             background=0.15):
    """3-type Poisson mixture: each type's markers elevated in-type."""
    rng = np.random.default_rng(seed)
    types = list(MARKERS)
    genes = [g for t in types for g in MARKERS[t]]
    genes += [f"N{i}" for i in range(noise_genes)]
    n = n_per * len(types)
    X = rng.poisson(background, (n, len(genes))).astype(np.float32)
    labels = np.repeat(types, n_per)
    for t_i, t in enumerate(types):
        rows = slice(t_i * n_per, (t_i + 1) * n_per)
        for g in MARKERS[t]:
            X[rows, genes.index(g)] = rng.poisson(marker_rate, n_per)
    a = sct.SpatialData(X=sp.csr_matrix(X))
    a.var_names = genes
    a.obs["cell_type"] = labels
    a.obs["shuffled"] = rng.permutation(labels)
    a.obsm["spatial"] = rng.uniform(0, 100, (n, 2))
    return a


@pytest.fixture(scope="module")
def adata():
    return _mixture()


def test_gene_overlap():
    assert gene_overlap(["A", "B", "C", "D"], ["B", "D", "E"]) == 0.5
    assert gene_overlap(["A"], ["A"]) == 1.0
    with pytest.raises(ValueError):
        gene_overlap([], ["A"])


def test_unassigned_rate(adata):
    a = adata.copy()
    assert unassigned_rate(a, "cell_type") == 0.0
    lab = a.obs["cell_type"].to_numpy(object).copy()
    lab[:36] = "Unassigned"
    a.obs["cell_type"] = lab
    assert unassigned_rate(a, "cell_type") == pytest.approx(0.1)
    a.obs["conf"] = np.ones(a.n_obs)
    a.obs.loc[a.obs.index[:72], "conf"] = 0.1
    r = unassigned_rate(a, "cell_type", confidence_column="conf",
                        confidence_threshold=0.8)
    assert r == pytest.approx(0.2)  # low-conf ⊇ unassigned here


def test_marker_quality_per_type_shape(adata):
    df = marker_quality_metrics(adata, "cell_type", markers=MARKERS)
    assert list(df.index) == ["alpha", "beta", "gamma"]
    assert (df["n_panel_markers"] == 3).all()
    assert df[["marker_cv", "marker_log2fc", "marker_purity",
               "contamination"]].notna().all().all()
    # strong synthetic signal: specific, pure, clean
    assert (df["marker_log2fc"] > 2).all()
    assert (df["marker_purity"] > 0.9).all()
    assert (df["contamination"] < 0.25).all()


def test_true_labels_beat_shuffled_on_every_metric(adata):
    good = marker_quality_metrics(adata, "cell_type", markers=MARKERS)
    bad = marker_quality_metrics(adata, "shuffled", markers=MARKERS)
    assert good["marker_cv"].mean() < bad["marker_cv"].mean()
    assert good["marker_log2fc"].mean() > bad["marker_log2fc"].mean()
    assert good["marker_purity"].mean() > bad["marker_purity"].mean()
    assert good["contamination"].mean() < bad["contamination"].mean()
    g = deg_log2fc(adata, "cell_type")
    b = deg_log2fc(adata, "shuffled")
    assert g.mean() > b.mean()


def test_benchmark_annotation_summary_and_ledger(adata):
    a = adata.copy()
    s = benchmark_annotation(a, "cell_type", markers=MARKERS,
                             model_genes=list(a.var_names)[:6])
    assert list(s.index) == SUMMARY_METRICS
    assert s["gene_overlap"] == 1.0
    assert s["unassigned_rate"] == 0.0
    assert np.isfinite(s.drop("gene_overlap")).all()
    assert "annotation_benchmark" in a.uns
    ops = [o["function"] for o in
           a.uns["spatialcore_metadata"]["operations"]]
    assert "benchmark_annotation" in ops


def test_compare_annotation_methods_table(adata):
    a = adata.copy()
    t = compare_annotation_methods(
        a, ["cell_type", "shuffled"],
        method_names=["pipeline", "standalone"], markers=MARKERS)
    assert list(t.columns) == ["pipeline", "standalone"]
    assert list(t.index) == SUMMARY_METRICS
    assert t.loc["marker_purity", "pipeline"] > \
        t.loc["marker_purity", "standalone"]
    # reference-table -> plotting shape round trip
    from spatialcore_tpu.plotting import plot_method_comparison
    import matplotlib
    matplotlib.use("Agg")
    fig = plot_method_comparison(
        t.T.rename_axis("method").reset_index())
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_case_insensitive_marker_matching(adata):
    lower = {t: [g.lower() for g in gs] for t, gs in MARKERS.items()}
    df = marker_quality_metrics(adata, "cell_type", markers=lower)
    assert (df["n_panel_markers"] == 3).all()


def test_markerless_and_unexpressed_edge_cases():
    """A type expressing NONE of its markers must not score a perfect
    CV of 0, and markerless types must not dilute contamination."""
    rng = np.random.default_rng(3)
    genes = ["GA0", "GA1", "GB0", "GB1", "N0", "N1"]
    n = 120
    X = np.zeros((3 * n, len(genes)), np.float32)
    X[:n, 0:2] = rng.poisson(5, (n, 2))          # alpha: expresses GA*
    # beta cells express NOTHING (dead type) — its markers GB* all zero
    X[2 * n:, 4:6] = rng.poisson(5, (n, 2))      # gamma: no marker dict
    a = sct.SpatialData(X=sp.csr_matrix(X))
    a.var_names = genes
    a.obs["cell_type"] = ["alpha"] * n + ["beta"] * n + ["gamma"] * n
    mk = {"alpha": ["GA0", "GA1"], "beta": ["GB0", "GB1"]}
    df = marker_quality_metrics(a, "cell_type", markers=mk)
    # beta expresses none of its markers: CV must be NaN, not 0.0
    assert np.isnan(df.loc["beta", "marker_cv"])
    assert np.isfinite(df.loc["alpha", "marker_cv"])
    # gamma has no markers at all: its metrics are NaN ...
    assert df.loc["gamma", ["marker_cv", "marker_purity"]].isna().all()
    # ... and it is excluded from others' contamination averages: alpha's
    # contamination is computed against beta only (whose self-signal is
    # eps-floored), not diluted by a zero gamma column
    assert np.isfinite(df.loc["alpha", "contamination"])


def test_compare_validates_confidence_columns(adata):
    with pytest.raises(ValueError, match="confidence_columns"):
        compare_annotation_methods(
            adata.copy(), ["cell_type", "shuffled"],
            confidence_columns=["only_one"], markers=MARKERS)
    with pytest.raises(ValueError, match="key_added"):
        compare_annotation_methods(
            adata.copy(), ["cell_type", "shuffled"], markers=MARKERS,
            key_added="custom")


def test_store_false_leaves_adata_untouched(adata):
    a = adata.copy()
    before_uns = set(a.uns)
    from spatialcore_tpu.core.metadata import get_operations
    n_ops = len(get_operations(a))
    benchmark_annotation(a, "cell_type", markers=MARKERS, store=False)
    assert set(a.uns) == before_uns
    assert len(get_operations(a)) == n_ops


def test_chunked_accumulation_matches_single_chunk(adata, monkeypatch):
    """Metric values must be identical regardless of chunk size."""
    import spatialcore_tpu.annotation.benchmark as B
    ref = marker_quality_metrics(adata, "cell_type", markers=MARKERS)
    # force 256-row chunks (the fixture has 360 cells -> 2 chunks,
    # exercising the zero-padded tail path)
    monkeypatch.setattr(B, "_CHUNK_BYTES", 1.0)
    small = marker_quality_metrics(adata, "cell_type", markers=MARKERS)
    pd.testing.assert_frame_equal(ref, small, rtol=1e-5, atol=1e-6)


def test_errors(adata):
    with pytest.raises(ValueError, match="not found"):
        marker_quality_metrics(adata, "nope")
    with pytest.raises(ValueError, match=">= 2"):
        a = adata.copy()
        a.obs["one"] = "alpha"
        deg_log2fc(a, "one")
