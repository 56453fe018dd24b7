"""End-to-end train_and_annotate pipeline on synthetic references."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation import TrainingConfig, train_and_annotate

TYPES = ["T cell", "B cell", "Macrophage", "Fibroblast"]


def _make_raw_reference(n_per_type=250, n_genes=40, seed=0, source="ref"):
    """Reference with RAW counts in layers (pipeline must re-normalize)."""
    rng = np.random.default_rng(seed)
    n = n_per_type * len(TYPES)
    counts = rng.poisson(1.0, size=(n, n_genes)).astype(np.float32)
    for t in range(len(TYPES)):
        rows = slice(t * n_per_type, (t + 1) * n_per_type)
        counts[rows, t * 8:t * 8 + 8] += rng.poisson(
            8.0, size=(n_per_type, 8))
    obs = pd.DataFrame({"cell_type": np.repeat(TYPES, n_per_type)},
                       index=[f"{source}_{i}" for i in range(n)])
    var = pd.DataFrame(index=[f"G{j}" for j in range(n_genes)])
    adata = sct.SpatialData(X=sp.csr_matrix(counts), obs=obs, var=var)
    adata.layers["counts"] = sp.csr_matrix(counts)
    adata.uns["reference_name"] = source
    return adata


def test_train_and_annotate_end_to_end(tmp_path):
    refA = _make_raw_reference(seed=0, source="refA")
    refB = _make_raw_reference(n_per_type=150, seed=1, source="refB")
    pA = tmp_path / "refA.h5ad"
    pB = tmp_path / "refB.h5ad"
    sct.write_h5ad(refA, pA)
    sct.write_h5ad(refB, pB)

    query = _make_raw_reference(n_per_type=120, seed=9, source="query")
    truth = query.obs["cell_type"].to_numpy().copy()
    query.obs.drop(columns=["cell_type"], inplace=True)

    out = tmp_path / "run"
    query, model = train_and_annotate(
        query, references=[str(pA), str(pB)],
        config=TrainingConfig(
            references=[], epochs=15, max_cells_per_type=400,
            output_dir=str(out), confidence_threshold=0.5,
            model_name="e2e_model", seed=0, compute_benchmark=True))

    labeled = query.obs["cell_type"].astype(str).to_numpy()
    assigned = labeled != "Unassigned"
    acc = (labeled[assigned] == truth[assigned]).mean()
    assert acc > 0.9
    assert assigned.mean() > 0.8
    assert (out / "e2e_model.npz").exists()
    assert (out / "celltyping_distribution.png").exists()
    assert (out / "celltyping_confidence_histogram.png").exists()
    # ontology IDs mapped for predictions
    assert (query.obs["cell_type_ontology_term_id"].astype(str)
            .str.startswith("CL:").any())
    ann = query.uns["spatialcore_annotation"]
    assert ann["n_types"] == 4
    assert ann["model_name"] == "e2e_model"
    # stage 10: the 7-metric quality table landed in uns
    bench = query.uns["annotation_benchmark"]["summary"]
    assert bench["gene_overlap"] == 1.0
    assert 0.0 <= bench["unassigned_rate"] <= 0.2


def test_training_config_yaml_roundtrip(tmp_path):
    cfg = TrainingConfig(references=["a.h5ad"], epochs=7,
                         confidence_threshold=0.9)
    p = cfg.to_yaml(tmp_path / "cfg.yaml")
    cfg2 = TrainingConfig.from_yaml(p)
    assert cfg2.epochs == 7 and cfg2.confidence_threshold == 0.9

    bad = TrainingConfig(references=[], epochs=0)
    with pytest.raises(ValueError):
        bad.validate()
