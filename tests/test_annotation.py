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

    # equal mode enforces the cap strictly; proportional (the default, like
    # the reference) may overshoot by ceil rounding + per-source floors
    sub = subsample_balanced(combined, max_cells_per_type=150,
                             source_column="reference_source",
                             source_balance="equal", seed=0)
    counts = sub.obs["cell_type"].value_counts()
    assert (counts <= 150).all()
    # both sources represented in capped types
    t_sub = sub.obs[sub.obs["cell_type"] == "T cell"]
    assert t_sub["reference_source"].nunique() == 2
    sub_p = subsample_balanced(combined, max_cells_per_type=150,
                               source_column="reference_source", seed=0)
    counts_p = sub_p.obs["cell_type"].value_counts()
    # bounded overshoot: <= n_sources ceils + one min_cells floor
    assert (counts_p <= 150 + 52).all()


def test_source_targets_allocation():
    # equal fill, hand-computed per the reference rules (training.py:
    # 1543-1618): per_source=166, remainder 2 -> a=167, b=min(167,30)=30,
    # c=166; shortfall 500-363=137 goes greedily to the first sorted
    # source with capacity (a)
    alloc = _source_targets({"a": 1000, "b": 30, "c": 1000}, 500,
                            min_cells_per_source=50, source_balance="equal")
    assert sum(alloc.values()) == 500
    assert alloc == {"a": 167 + 137, "b": 30, "c": 166}


def test_source_targets_proportional_matches_reference_arithmetic():
    # hand-computed per the reference rules (training.py:1543-1618):
    # shares of 600: a=3000/4000 -> ceil(450), b=800/4000 -> ceil(120),
    # c=200/4000 -> ceil(30) -> floored to min 50 (c has >= 50 available)
    alloc = _source_targets({"a": 3000, "b": 800, "c": 200}, 600,
                            min_cells_per_source=50,
                            source_balance="proportional")
    assert alloc == {"a": 450, "b": 120, "c": 50}
    # shortfall redistribution: b capped at 100 available; its missing 20
    # goes to the first sorted source with capacity (a)
    alloc = _source_targets({"a": 3000, "b": 100, "c": 200}, 600,
                            min_cells_per_source=50,
                            source_balance="proportional")
    # shares of 600 over 3300: a=ceil(545.45)=546, b=100->cap 100... b share
    # = ceil(600*100/3300)=19 -> floor 50, c share = ceil(36.36)=37 -> 50
    assert alloc["b"] == 50 and alloc["c"] == 50
    assert sum(alloc.values()) >= 600  # proportional may overshoot (ref too)


def test_resolve_target_totals_fixed_point():
    from spatialcore_tpu.annotation.training import _resolve_target_totals

    # no proportions: plain cap with min-keep
    t = _resolve_target_totals({"A": 10000, "B": 30, "C": 600}, 50, 5000,
                               None)
    assert t == {"A": 5000, "B": 30, "C": 600}
    # proportions: A pinned to 50% of the final output. Fixed side:
    # B=30 (<= min), C=600 -> fixed_total=630; T solves A=0.5*T with
    # A <= 10000: T = 630/(1-0.5) = 1260 -> A=630, total=1260.
    t = _resolve_target_totals({"A": 10000, "B": 30, "C": 600}, 50, 5000,
                               {"A": 0.5})
    assert t["B"] == 30 and t["C"] == 600
    assert t["A"] == 630
    total = sum(t.values())
    assert abs(t["A"] / total - 0.5) < 0.01
    # availability cap engages: A only has 400 cells
    t = _resolve_target_totals({"A": 400, "B": 30, "C": 600}, 50, 5000,
                               {"A": 0.5})
    assert t["A"] == 400
    # validation errors
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not found in data"):
        _resolve_target_totals({"A": 100}, 10, 50, {"Z": 0.5})
    with _pytest.raises(ValueError, match="must be <= 1.0"):
        _resolve_target_totals({"A": 100, "B": 100}, 10, 50,
                               {"A": 0.9, "B": 0.9})
    with _pytest.raises(ValueError, match="sum to 1.0"):
        _resolve_target_totals({"A": 100, "B": 100}, 10, 50, {"A": 1.0})


def test_subsample_balanced_target_proportions():
    import pandas as pd

    from spatialcore_tpu.core.container import SpatialData

    rng = np.random.default_rng(0)
    n_a, n_b, n_c = 4000, 1000, 500
    n = n_a + n_b + n_c
    obs = pd.DataFrame({
        "cell_type": ["A"] * n_a + ["B"] * n_b + ["C"] * n_c,
        "reference_source": rng.choice(["r1", "r2"], n),
    }, index=[f"c{i}" for i in range(n)])
    ad = SpatialData(X=rng.poisson(1.0, (n, 5)).astype(np.float32), obs=obs)
    sub = subsample_balanced(ad, max_cells_per_type=2000,
                             target_proportions={"A": 0.6}, seed=1)
    counts = sub.obs["cell_type"].value_counts()
    total = counts.sum()
    assert abs(counts["A"] / total - 0.6) < 0.02
    assert counts["B"] == 1000 and counts["C"] == 500  # under their caps


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


def test_model_registry_publish_and_annotate(tmp_path, monkeypatch):
    """annotate_cells(models='immune_global') works from a published artifact
    (VERDICT item 7: pretrained-model story for TISSUE_MODEL_PRESETS)."""
    import pandas as pd

    from spatialcore_tpu.annotation import (
        annotate_cells, get_models_for_tissue, publish_model, register_model,
        resolve_model, train_cell_type_model)
    from spatialcore_tpu.core.container import SpatialData

    rng = np.random.default_rng(0)
    n, g = 400, 24
    genes = [f"G{i}" for i in range(g)]
    y = rng.choice(["T cell", "B cell"], n)
    X = rng.poisson(1.0, (n, g)).astype(np.float32)
    X[y == "T cell", :4] += 6
    X[y == "B cell", 4:8] += 6
    train = SpatialData(
        X=np.log1p(X),
        obs=pd.DataFrame({"cell_type": y}, index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes))
    model = train_cell_type_model(train, epochs=10, seed=0)

    models_dir = tmp_path / "models"
    registry = tmp_path / "registry.json"
    monkeypatch.setattr("spatialcore_tpu.annotation.registry.REGISTRY_PATH",
                        registry)
    monkeypatch.setattr(
        "spatialcore_tpu.annotation.registry.DEFAULT_MODELS_DIR", models_dir)
    path = publish_model(model, "immune_global", models_dir=models_dir)
    assert path.exists() and path.with_suffix(".json").exists()

    # preset name resolves through the registry even from an empty dir
    assert "immune_global" in get_models_for_tissue("blood")
    m2 = resolve_model("immune_global", models_dir=tmp_path / "empty")
    assert m2.classes == model.classes

    # file:// URI registration resolves too
    register_model("via_uri", f"file://{path}")
    m3 = resolve_model("via_uri", models_dir=tmp_path / "empty")
    assert m3.n_genes == model.n_genes

    query = SpatialData(
        X=train.X.copy(),
        obs=pd.DataFrame(index=[f"q{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes))
    annotate_cells(query, models="immune_global", models_dir=models_dir)
    acc = (query.obs["cell_type"].to_numpy() == y).mean()
    assert acc > 0.9

    # unknown names fail with the publishing recipe
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="publish_model"):
        resolve_model("no_such_model", models_dir=tmp_path / "empty")


def test_decision_scores_device_input_matches_numpy():
    """A jax-array X must score identically to numpy X (device-resident
    path added round 3 — no host bounce), including absent-gene fill."""
    import jax.numpy as jnp
    import numpy as np

    from spatialcore_tpu.annotation.model import CellTypeModel

    rng = np.random.default_rng(0)
    g, c = 24, 4
    model = CellTypeModel(
        W=rng.normal(size=(g, c)).astype(np.float32),
        b=rng.normal(size=(c,)).astype(np.float32),
        classes=[f"T{i}" for i in range(c)],
        genes=[f"G{i}" for i in range(g)],
        scaler_mean=rng.normal(size=(g,)).astype(np.float32),
        scaler_std=(rng.uniform(0.5, 2.0, g)).astype(np.float32),
    )
    X = rng.normal(size=(100, g + 6)).astype(np.float32)
    gene_idx = np.concatenate([np.arange(g - 5) + 3,
                               -np.ones(5, np.int64)]).astype(np.int64)
    s_np = model.decision_scores(X, gene_idx=gene_idx)
    s_dev = model.decision_scores(jnp.asarray(X), gene_idx=gene_idx)
    np.testing.assert_allclose(s_dev, s_np, rtol=1e-5, atol=1e-6)
    # labels agree end-to-end too
    l_np, _ = model.predict(X, gene_idx=gene_idx)
    l_dev, _ = model.predict(jnp.asarray(X), gene_idx=gene_idx)
    assert (l_np == l_dev).all()
