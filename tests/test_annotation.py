"""Annotation core: model, training, annotate, confidence, balancing."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation import (
    CellTypeModel, annotate_cells, combine_references, ensure_normalized,
    filter_low_confidence, filter_low_count_types, generate_color_scheme,
    get_models_for_tissue, load_canonical_markers, save_model_artifacts,
    subsample_balanced, train_cell_type_model, transform_confidence)
from spatialcore_tpu.annotation.training import _source_targets

from conftest import make_adata


# ---------------------------------------------------------------------------
# synthetic single-cell world: 4 types with disjoint marker blocks
# ---------------------------------------------------------------------------

TYPES = ["T cell", "B cell", "Macrophage", "Fibroblast"]


def _make_reference(n_per_type=300, n_genes=40, seed=0, source="refA"):
    rng = np.random.default_rng(seed)
    n = n_per_type * len(TYPES)
    counts = rng.poisson(1.0, size=(n, n_genes)).astype(np.float32)
    for t, typ in enumerate(TYPES):
        rows = slice(t * n_per_type, (t + 1) * n_per_type)
        cols = slice(t * 8, t * 8 + 8)  # 8 marker genes per type
        counts[rows, cols] += rng.poisson(8.0, size=(n_per_type, 8))
    obs = pd.DataFrame({
        "cell_type": np.repeat(TYPES, n_per_type),
    }, index=[f"{source}_{i}" for i in range(n)])
    var = pd.DataFrame(index=[f"G{j}" for j in range(n_genes)])
    adata = sct.SpatialData(X=sp.csr_matrix(counts), obs=obs, var=var)
    adata.layers["counts"] = sp.csr_matrix(counts)
    adata.uns["reference_name"] = source
    ensure_normalized(adata)
    return adata


@pytest.fixture(scope="module")
def trained():
    ref = _make_reference()
    model = train_cell_type_model(ref, epochs=20, seed=0,
                                  model_name="test_model")
    return ref, model


def test_train_accuracy_and_determinism(trained):
    ref, model = trained
    labels, scores = model.predict(np.asarray(ref.X.todense()))
    acc = (labels == ref.obs["cell_type"].to_numpy()).mean()
    assert acc > 0.95
    model2 = train_cell_type_model(_make_reference(), epochs=20, seed=0)
    np.testing.assert_array_equal(model.W, model2.W)


def test_model_save_load_roundtrip(trained, tmp_path):
    _, model = trained
    paths = save_model_artifacts(model, tmp_path)
    assert paths["model"].exists() and paths["colors"].exists()
    loaded = CellTypeModel.load(paths["model"])
    assert loaded.classes == model.classes
    np.testing.assert_allclose(loaded.W, model.W)
    assert loaded.metadata["model_name"] == "test_model"


def test_annotate_full_overlap(trained):
    ref, model = trained
    query = _make_reference(n_per_type=100, seed=7, source="query")
    query = annotate_cells(query, model)
    acc = (query.obs["cell_type"].to_numpy().astype(str)
           == query.obs["cell_type"].to_numpy().astype(str)).mean()
    truth = np.repeat(TYPES, 100)
    acc = (query.obs["cell_type_predicted"].to_numpy().astype(str)
           == truth).mean()
    assert acc > 0.9
    assert query.obs["cell_type_confidence"].between(0, 1).all()
    assert query.obsm["cell_type_decision_scores"].shape == (400, 4)
    assert query.uns["cell_type_decision_scores_classes"] == sorted(TYPES)


def test_annotate_partial_overlap_and_gate(trained):
    _, model = trained
    query = _make_reference(n_per_type=100, seed=8, source="q2")
    # keep 50% of genes (all marker blocks partially present)
    keep = [f"G{j}" for j in range(0, 40, 2)]
    query = query[:, keep]
    query = annotate_cells(query, model, min_gene_overlap_pct=25.0)
    truth = np.repeat(TYPES, 100)
    acc = (query.obs["cell_type_predicted"].to_numpy().astype(str)
           == truth).mean()
    assert acc > 0.8

    tiny = query[:, [f"G{j}" for j in range(0, 8, 2)]]
    with pytest.raises(ValueError, match="gate"):
        annotate_cells(tiny, model, min_gene_overlap_pct=25.0)


def test_annotate_ensemble_max_confidence(trained):
    ref, model = trained
    # a deliberately bad model: trained on shuffled labels
    bad_ref = _make_reference(seed=3)
    rng = np.random.default_rng(0)
    bad_ref.obs["cell_type"] = rng.permutation(
        bad_ref.obs["cell_type"].to_numpy())
    bad = train_cell_type_model(bad_ref, epochs=5, seed=1,
                                model_name="bad_model")
    query = _make_reference(n_per_type=80, seed=9, source="q3")
    query = annotate_cells(query, [model, bad])
    # the good model should win the overwhelming majority of cells
    frac_good = (query.obs["cell_type_model"] == "test_model").mean()
    assert frac_good > 0.8


def test_transform_confidence_methods():
    scores = np.array([[5.0, 0.1, 0.1, 0.1],
                       [2.0, 1.8, 1.9, 1.7],
                       [0.5, -1.0, -0.5, 0.3]])
    z = transform_confidence(scores, "zscore")
    assert z[0] > 0.8 and z[1] < z[0]
    s = transform_confidence(scores, "softmax")
    np.testing.assert_allclose(
        s[0], np.exp(5) / (np.exp(5) + 3 * np.exp(0.1)), rtol=1e-6)
    m = transform_confidence(scores, "minmax")
    assert (m == 1.0).all()
    r = transform_confidence(scores, "raw")
    np.testing.assert_allclose(r, [5.0, 2.0, 0.5])
    with pytest.raises(ValueError, match="at least 2"):
        transform_confidence(scores[:, :1])


def test_confidence_filters():
    adata = make_adata(n_obs=200, n_vars=5)
    adata.obs["cell_type"] = pd.Categorical(
        ["A"] * 150 + ["B"] * 40 + ["C"] * 10)
    adata.obs["cell_type_confidence"] = np.concatenate(
        [np.full(100, 0.95), np.full(100, 0.5)])
    adata = filter_low_confidence(adata, threshold=0.8)
    assert (adata.obs["cell_type"].to_numpy()[100:] == "Unassigned").all()
    adata = filter_low_count_types(adata, min_cells=20)
    vals = set(adata.obs["cell_type"].unique())
    assert "C" not in vals


def test_combine_references_and_balancing():
    refA = _make_reference(n_per_type=200, seed=0, source="refA")
    refB = _make_reference(n_per_type=100, seed=1, source="refB")
    # refB has junk labels to exclude
    labels = refB.obs["cell_type"].to_numpy(object)
    labels[:30] = "Unknown"
    refB.obs["cell_type"] = labels
    combined = combine_references([refA, refB])
    assert "reference_source" in combined.obs.columns
    assert (combined.obs["cell_type"] != "Unknown").all()
    assert combined.n_obs == 800 + 400 - 30
    assert combined.n_vars == 40

    sub = subsample_balanced(combined, max_cells_per_type=150,
                             source_column="reference_source", seed=0)
    counts = sub.obs["cell_type"].value_counts()
    assert (counts <= 150).all()
    # both sources represented in capped types
    t_sub = sub.obs[sub.obs["cell_type"] == "T cell"]
    assert t_sub["reference_source"].nunique() == 2


def test_source_targets_allocation():
    # equal fill with floor and redistribution
    alloc = _source_targets({"a": 1000, "b": 30, "c": 1000}, cap=500,
                            min_cells_per_source=50)
    assert sum(alloc.values()) == 500
    assert alloc["b"] == 30            # keeps all (below floor share)
    assert abs(alloc["a"] - alloc["c"]) <= 1


def test_misc_helpers():
    colors = generate_color_scheme(["x", "y"])
    assert set(colors) == {"x", "y"}
    markers = load_canonical_markers()
    assert "MS4A1" in markers["B cell"]
    assert "lung" in [t for t in ("lung",)] and get_models_for_tissue("lung")
    with pytest.raises(ValueError):
        get_models_for_tissue("made_up_tissue")


def test_annotate_over_clustering_majority(trained):
    _, model = trained
    query = _make_reference(n_per_type=60, seed=11, source="q4")
    # clusters aligned with true types -> majority vote cleans noise
    query.obs["leiden"] = np.repeat([f"c{t}" for t in range(4)], 60)
    query = annotate_cells(query, model, over_clustering="leiden")
    labels = query.obs["cell_type"].astype(str).to_numpy()
    for t in range(4):
        seg = labels[t * 60:(t + 1) * 60]
        assert len(set(seg)) == 1          # one label per cluster
    with pytest.raises(ValueError, match="over_clustering"):
        annotate_cells(query, model, over_clustering="missing")


def test_subsample_balanced_keeps_ungrouped_cells():
    """Regression: NaN group values (unmapped ontology IDs) must not drop
    cells — pandas' astype(str) preserves NaN and nan != nan emptied the
    group selection."""
    adata = _make_reference(n_per_type=50)
    ids = np.full(adata.n_obs, None, dtype=object)
    ids[:50] = "CL:0000236"                  # only one type maps
    adata.obs["cell_type_ontology_term_id"] = pd.array(ids, dtype=object)
    sub = subsample_balanced(adata, max_cells_per_type=5000,
                             group_by_column="cell_type_ontology_term_id")
    assert sub.n_obs == adata.n_obs          # under cap: nothing dropped
