"""Wilcoxon DEG kernel (vs scipy golden values) and plotting smoke tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp
from scipy.stats import ranksums

import spatialcore_tpu as sct
from spatialcore_tpu.stats import rank_genes_groups

from conftest import make_adata


def _marker_adata(n_per=150, n_genes=20, seed=0):
    rng = np.random.default_rng(seed)
    n = n_per * 3
    X = rng.gamma(1.0, 1.0, (n, n_genes)).astype(np.float32)
    X[:n_per, 0] += rng.gamma(6, 1.0, n_per)          # gene 0 marks type A
    X[n_per:2 * n_per, 1] += rng.gamma(6, 1.0, n_per)  # gene 1 marks type B
    adata = make_adata(n_obs=n, n_vars=n_genes)
    adata.X = sp.csr_matrix(X)
    adata.obs["ct"] = ["A"] * n_per + ["B"] * n_per + ["C"] * n_per
    return adata, X


def test_wilcoxon_matches_scipy():
    adata, X = _marker_adata()
    adata = rank_genes_groups(adata, "ct")
    deg = adata.uns["rank_genes_groups"]
    assert deg["names"]["A"][0] == "GENE0"
    assert deg["names"]["B"][0] == "GENE1"
    # z-scores match scipy ranksums (no tie correction ↔ scipy uses tie-free
    # normal approx; data is continuous so ties are absent)
    mask = (adata.obs["ct"] == "A").to_numpy()
    for j, gene in enumerate(adata.var_names[:4]):
        want = ranksums(X[mask, j], X[~mask, j]).statistic
        gi = deg["names"]["A"].index(gene)
        got = deg["scores"]["A"][gi]
        np.testing.assert_allclose(got, want, rtol=1e-4)
    # padj is f32 on-device, pvals f64 on host → compare with f32 slack
    assert (np.asarray(deg["pvals_adj"]["A"])
            >= np.asarray(deg["pvals"]["A"]) - 1e-6).all()


def test_deg_validations():
    adata, _ = _marker_adata()
    with pytest.raises(ValueError, match="not found"):
        rank_genes_groups(adata, "nope")
    with pytest.raises(ValueError, match="wilcoxon"):
        rank_genes_groups(adata, "ct", method="t-test")
    with pytest.raises(ValueError, match="not present"):
        rank_genes_groups(adata, "ct", groups=["Z"])


def test_plotting_suite_smoke(tmp_path):
    adata, _ = _marker_adata()
    adata.obs["cell_type"] = adata.obs["ct"]
    adata.obs["cell_type_pred"] = adata.obs["ct"]
    adata.obs["cell_type_confidence"] = np.random.default_rng(0).uniform(
        0.5, 1.0, adata.n_obs)
    adata.obs["cell_type_model"] = "m1"

    from spatialcore_tpu.plotting.benchmark import (
        agreement_metrics, classification_report_table,
        plot_agreement_heatmap, plot_classification_report,
        plot_confusion_matrix, plot_silhouette_by_type)
    from spatialcore_tpu.plotting.celltype import (
        plot_celltype_distribution, plot_celltype_embedding,
        plot_celltype_pie)
    from spatialcore_tpu.plotting.confidence import (
        plot_confidence_by_celltype, plot_confidence_histogram,
        plot_model_contribution)
    from spatialcore_tpu.plotting.spatial import (
        plot_spatial_celltype, plot_spatial_confidence, plot_spatial_gene,
        plot_spatial_genes)
    from spatialcore_tpu.plotting.validation import plot_deg_heatmap

    out = tmp_path
    plot_celltype_distribution(adata, path=out / "a.png")
    plot_celltype_pie(adata, path=out / "b.png")
    plot_celltype_embedding(adata, path=out / "c.png")
    plot_confidence_histogram(adata, threshold=0.8, path=out / "d.png")
    plot_confidence_by_celltype(adata, path=out / "e.png")
    plot_model_contribution(adata, path=out / "f.png")
    plot_spatial_celltype(adata, path=out / "g.png")
    plot_spatial_confidence(adata, path=out / "h.png")
    plot_spatial_gene(adata, "GENE0", path=out / "i.png")
    plot_spatial_genes(adata, ["GENE0", "GENE1"], path=out / "j.png")
    # reference array form + historical AnnData convenience form
    yt = adata.obs["cell_type"].to_numpy(str)
    yp = adata.obs["cell_type_pred"].to_numpy(str)
    plot_confusion_matrix(yt, yp, save=out / "k.png")
    plot_confusion_matrix(adata, "cell_type", "cell_type_pred",
                          path=out / "k2.png")
    plot_classification_report(yt, yp, save=out / "l.png")
    plot_classification_report(adata, "cell_type", "cell_type_pred",
                               path=out / "l2.png")
    plot_agreement_heatmap(adata, ["cell_type", "cell_type_pred"],
                           save=out / "m.png")
    plot_agreement_heatmap(adata, "cell_type", "cell_type_pred",
                           path=out / "m2.png")
    plot_silhouette_by_type(adata, path=out / "n.png")
    plot_deg_heatmap(adata, path=out / "o.png")

    rep = classification_report_table(adata, "cell_type", "cell_type_pred")
    assert rep.attrs["accuracy"] == 1.0
    met = agreement_metrics(adata.obs["cell_type"],
                            adata.obs["cell_type_pred"])
    assert met["nmi"] == pytest.approx(1.0)
    for f in "abcdefghijklmno":
        assert (out / f"{f}.png").exists()


def test_palette_roundtrip_and_method_comparison(tmp_path):
    from spatialcore_tpu.plotting.benchmark import plot_method_comparison
    from spatialcore_tpu.plotting.utils import (
        generate_celltype_palette, load_palette, save_palette)

    pal = generate_celltype_palette(["B cell", "T cell"])
    p = save_palette(pal, tmp_path / "pal.json")
    assert load_palette(p) == pal

    import pandas as pd
    df = pd.DataFrame({"method": ["CellTypist", "Manual"],
                       "Accuracy": [0.85, 0.92],
                       "Silhouette": [0.45, 0.48]})
    plot_method_comparison(df, metrics=["Accuracy", "Silhouette"],
                           save=tmp_path / "mc.png")
    assert (tmp_path / "mc.png").exists()
    with pytest.raises(ValueError):
        plot_method_comparison(df, method_column="nope")


def test_celltype_confidence_spatial(tmp_path):
    from spatialcore_tpu.plotting.validation import (
        plot_celltype_confidence_spatial)

    adata, _ = _marker_adata()
    adata.obs["cell_type"] = adata.obs["ct"]
    adata.obs["cell_type_confidence"] = np.random.default_rng(0).uniform(
        0.4, 1.0, adata.n_obs)
    plot_celltype_confidence_spatial(adata, path=tmp_path / "ccs.png")
    assert (tmp_path / "ccs.png").exists()


def test_deg_nan_labels_excluded():
    """Null-labeled cells must not contaminate the 'rest' population."""
    rng = np.random.default_rng(5)
    n = 90
    X = rng.poisson(2.0, (n, 6)).astype(np.float32)
    a = sct.SpatialData(X=sp.csr_matrix(X))
    a.var_names = [f"G{i}" for i in range(6)]
    lab = np.array(["A"] * 40 + [None] * 10 + ["B"] * 40, object)
    a.obs["grp"] = lab
    res = rank_genes_groups(a.copy(), "grp", copy=True)
    rg = res.uns["rank_genes_groups"]
    assert set(rg["names"]) == {"A", "B"}

    # oracle: scipy ranksums on ONLY the non-null cells
    from scipy.stats import ranksums
    keep = lab != None  # noqa: E711
    zs = np.array([ranksums(X[keep][:40, j], X[keep][40:, j]).statistic
                   for j in range(6)])
    got = {g: dict(zip(rg["names"][g], rg["scores"][g])) for g in ("A",)}
    for j in range(6):
        assert abs(got["A"][f"G{j}"] - zs[j]) < 1e-3, (j, zs[j])


def test_deg_requested_small_group_raises():
    rng = np.random.default_rng(6)
    X = rng.poisson(2.0, (50, 4)).astype(np.float32)
    a = sct.SpatialData(X=sp.csr_matrix(X))
    a.var_names = [f"G{i}" for i in range(4)]
    a.obs["grp"] = ["A"] * 25 + ["B"] * 24 + ["C"]
    with pytest.raises(ValueError, match="below min_cells"):
        rank_genes_groups(a.copy(), "grp", groups=["A", "C"], copy=True)
