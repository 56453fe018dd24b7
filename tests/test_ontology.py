"""Ontology matcher, pattern table, label validation."""

import numpy as np
import pandas as pd
import pytest

from spatialcore_tpu.annotation import (
    add_ontology_ids, check_label_ontology_consistency, get_canonical_term,
    load_ontology_index, search_ontology_index, validate_cell_type_column)
from spatialcore_tpu.annotation.ontology import (
    BLACKLISTED_CL_IDS, extract_biological_tokens, score_match)

from conftest import make_adata


def test_pattern_canonicalization():
    cases = {
        "CD8+ T cells": "cd8-positive, alpha-beta t cell",
        "CD4 T cell": "cd4-positive, alpha-beta t cell",
        "Tregs": "regulatory t cell",
        "NK cells": "natural killer cell",
        "Plasma cells": "plasma cell",
        "classical monocytes": "classical monocyte",
        "M2 macrophage": "alternatively activated macrophage",
        "pDC": "plasmacytoid dendritic cell",
        "Cancer-associated fibroblasts": "fibroblast",
        "Alveolar Type 2": "type ii pneumocyte",
        "tumor cells": "malignant cell",
        "LYVE1+ lymphatic endothelium": "endothelial cell of lymphatic vessel",
    }
    for raw, want in cases.items():
        assert get_canonical_term(raw) == want, raw
    assert get_canonical_term("totally mysterious") is None


def test_tokenizer():
    t = extract_biological_tokens("CD4+ memory T cells")
    assert t["markers"] == ["cd4"]
    assert "t" in t["core_words"]
    assert "memory" in t["modifiers"]


def test_search_ontology_index_tiers():
    res = search_ontology_index([
        "B cell",                 # exact
        "B-cells",                # pattern → exact canonical
        "CD8+ cytotoxic T cells",  # pattern
        "hepatocytes",            # fuzzy/contains
        "flux capacitor",         # no match
    ])
    assert res["B cell"][0]["id"] == "CL:0000236"
    assert res["B cell"][0]["score"] == 1.0
    assert res["B cell"][0]["match_type"] == "tier1_exact"
    assert res["B-cells"][0]["id"] == "CL:0000236"
    assert res["B-cells"][0]["match_type"] == "tier0_pattern"
    assert res["CD8+ cytotoxic T cells"][0]["id"] == "CL:0000625"
    assert res["hepatocytes"][0]["id"] == "CL:0000182"
    assert res["flux capacitor"] == []
    # matches are sorted by descending score and ID-deduplicated
    scores = [m["score"] for m in res["hepatocytes"]]
    assert scores == sorted(scores, reverse=True)
    ids = [m["id"] for m in res["hepatocytes"]]
    assert len(ids) == len(set(ids))


def test_blacklist_never_returned():
    res = search_ontology_index(["cell", "native cell"])
    for matches in res.values():
        assert all(m["id"] not in BLACKLISTED_CL_IDS for m in matches)


def test_score_match_ordering():
    tokens = extract_biological_tokens("b cell")
    exact = score_match("b cell", "b cell", tokens, False)
    sym = score_match("b-cell", "b cell",
                      extract_biological_tokens("b-cell"), False)
    assert exact == 1.0 and 0.9 <= sym < 1.0


def test_add_ontology_ids_and_skip(tmp_path):
    adata = make_adata(n_obs=90, n_vars=5)
    adata.obs["cell_type"] = (["B cells"] * 30 + ["CD8 T cells"] * 30
                              + ["Unassigned"] * 30)
    # 10 cells carry native IDs that must be preserved
    native = np.full(90, None, object)
    native[:10] = "CL:9999999"
    adata.obs["cell_type_ontology_term_id"] = native
    adata, mappings, result = add_ontology_ids(
        adata, save_mapping=tmp_path, dataset_name="demo")
    ids = adata.obs["cell_type_ontology_term_id"].to_numpy()
    assert (ids[:10] == "CL:9999999").all()
    assert (ids[10:30] == "CL:0000236").all()
    assert (ids[30:60] == "CL:0000625").all()
    assert (ids[60:] == "skipped").all()    # placeholder label marked
    tiers = adata.obs["cell_type_ontology_tier"]
    assert (tiers.iloc[:10] == "native").all()
    assert (tiers.iloc[60:] == "skipped").all()
    assert adata.obs["cell_type_ontology_score"].iloc[15] >= 0.9
    # mappings dict is the raw search result (lists per label)
    assert mappings["B cells"][0]["id"] == "CL:0000236"
    # OntologyMappingResult written to disk
    assert result is not None
    assert (tmp_path / "demo_ontology_mapping.csv").exists()
    assert (tmp_path / "demo_ontology_mapping_metadata.json").exists()
    row = result.table.set_index("input_label").loc["Unassigned"]
    assert row["match_tier"] == "skipped"
    assert result.metadata["summary"]["mapped"] == 2


def test_has_ontology_ids_coverage():
    from spatialcore_tpu.annotation import has_ontology_ids
    adata = make_adata(n_obs=40, n_vars=5)
    st = has_ontology_ids(adata)
    assert st["has_column"] is False and st["coverage"] == 0.0
    ids = ["CL:0000236"] * 10 + [None] * 30
    adata.obs["cell_type_ontology_term_id"] = pd.array(ids, dtype=object)
    adata.obs["reference_source"] = ["a"] * 20 + ["b"] * 20
    st = has_ontology_ids(adata)
    assert st["has_column"] and st["n_with_ids"] == 10
    assert abs(st["coverage"] - 0.25) < 1e-9
    assert st["unique_ids"] == ["CL:0000236"]
    assert st["by_source"]["a"] == 0.5 and st["by_source"]["b"] == 0.0


def test_create_mapping_table_result():
    from spatialcore_tpu.annotation import create_mapping_table
    mappings = search_ontology_index(["B cells", "flux capacitor"])
    res = create_mapping_table(mappings,
                               {"B cells": 100, "flux capacitor": 3},
                               skipped_labels=["Unassigned"])
    assert set(res.table.columns) == {
        "input_label", "ontology_name", "ontology_id", "match_tier",
        "score", "n_cells", "canonical_term"}
    by_label = res.table.set_index("input_label")
    assert by_label.loc["B cells", "ontology_id"] == "CL:0000236"
    assert by_label.loc["flux capacitor", "match_tier"] == "unmapped"
    assert by_label.loc["Unassigned", "ontology_id"] == "skipped"
    assert res.errors and res.errors[0]["label"] == "flux capacitor"
    assert res.metadata["tier_breakdown"]["unmapped"] == 1


def test_validate_cell_type_column():
    adata = make_adata(n_obs=300, n_vars=5)
    adata.obs["good"] = ["T cell"] * 150 + ["B cell"] * 150
    res = validate_cell_type_column(adata, "good")
    assert res.valid and res.n_types == 2

    adata.obs["clusters"] = [f"cluster_{i % 5}" for i in range(300)]
    res = validate_cell_type_column(adata, "clusters")
    assert not res.valid
    assert any("cluster" in i.message for i in res.errors)

    with pytest.raises(ValueError):
        validate_cell_type_column(adata, "missing_col", raise_on_error=True)

    nulls = pd.array(["T cell"] * 200 + [None] * 100, dtype=object)
    adata.obs["nully"] = nulls
    res = validate_cell_type_column(adata, "nully")
    assert not res.valid


def test_label_ontology_consistency():
    adata = make_adata(n_obs=60, n_vars=5)
    adata.obs["cell_type"] = ["A"] * 30 + ["B"] * 30
    ids = ["CL:1"] * 15 + ["CL:2"] * 15 + ["CL:3"] * 30
    adata.obs["cell_type_ontology_term_id"] = ids
    issues = check_label_ontology_consistency(adata)
    assert any("multiple" in i.message for i in issues)


def test_index_loads():
    idx = load_ontology_index()
    assert len(idx["cl"]) > 90
    assert idx["cl"]["t cell"]["id"] == "CL:0000084"
