"""Annotation validation suite: marker heatmap, 2D validation, QC bundle.

Parity with /root/reference/src/spatialcore/plotting/validation.py: marker
heatmap (:34), the confidence × marker-score 2D validation (:184), and
``generate_annotation_plots`` (:1222) — the 4-figure QC bundle the pipeline
emits at Stage 8.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd
import scipy.sparse as sp

from ..core.logging import get_logger
from .utils import save_figure, setup_figure

logger = get_logger("plotting.validation")


def plot_marker_heatmap(
    adata,
    cell_type_column: str = "cell_type",
    markers: Optional[Dict[str, List[str]]] = None,
    max_markers_per_type: int = 4,
    path: Optional[Union[str, Path]] = None,
):
    """Mean expression of canonical markers per cell type (z-scored rows)."""
    if markers is None:
        from ..annotation.markers import load_canonical_markers

        markers = load_canonical_markers()
    var_index = {g: i for i, g in enumerate(adata.var_names)}
    labels = adata.obs[cell_type_column].astype(str)
    types = sorted(labels.unique())
    genes, gene_owner = [], []
    for ct in types:
        found = [g for g in markers.get(ct, []) if g in var_index]
        for g in found[:max_markers_per_type]:
            if g not in genes:
                genes.append(g)
                gene_owner.append(ct)
    if not genes:
        raise ValueError(
            "No canonical markers found in the panel for any cell type")

    X = adata.X[:, [var_index[g] for g in genes]]
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)
    mat = np.zeros((len(types), len(genes)), np.float32)
    for i, ct in enumerate(types):
        mat[i] = X[(labels == ct).to_numpy()].mean(axis=0)
    mu = mat.mean(axis=0, keepdims=True)
    sd = mat.std(axis=0, keepdims=True)
    matz = (mat - mu) / np.where(sd < 1e-9, 1.0, sd)

    fig, axes = setup_figure(ax_width=max(6, 0.28 * len(genes)),
                             ax_height=max(4, 0.3 * len(types)))
    ax = axes[0, 0]
    im = ax.imshow(matz, aspect="auto", cmap="RdBu_r", vmin=-2.5, vmax=2.5)
    ax.set_xticks(range(len(genes)))
    ax.set_xticklabels(genes, rotation=90, fontsize=7)
    ax.set_yticks(range(len(types)))
    ax.set_yticklabels(types, fontsize=8)
    fig.colorbar(im, ax=ax, label="mean expression (z)")
    ax.set_title("canonical markers by annotated type")
    if path:
        return save_figure(fig, path)
    return fig


def plot_2d_validation(
    adata,
    cell_type_column: str = "cell_type",
    confidence_column: str = "cell_type_confidence",
    confidence_threshold: float = 0.8,
    marker_probability_threshold: float = 0.3,
    min_cells: int = 50,
    markers: Optional[Dict[str, List[str]]] = None,
    seed: int = 42,
    path: Optional[Union[str, Path]] = None,
):
    """Confidence × GMM-3 marker-metagene scatter per cell type.

    Green = passes both gates, red = fails both (the dual-threshold QC view,
    reference validation.py:184). Returns (figure, summary DataFrame).
    """
    from ..annotation.markers import load_canonical_markers
    from ..stats.thresholding import compute_metagene_score, threshold_gmm

    markers = markers or load_canonical_markers()
    var_index = {g: i for i, g in enumerate(adata.var_names)}
    labels = adata.obs[cell_type_column].astype(str)
    conf = adata.obs[confidence_column].to_numpy(float)

    panels = []
    for ct in sorted(labels.unique()):
        genes = [g for g in markers.get(ct, []) if g in var_index]
        cells = np.nonzero((labels == ct).to_numpy())[0]
        if len(genes) < 2 or cells.size < min_cells:
            continue
        X = adata.X[cells][:, [var_index[g] for g in genes]]
        if sp.issparse(X):
            X = np.asarray(X.todense())
        score = np.asarray(compute_metagene_score(
            np.asarray(X, np.float32), "shifted_geometric_mean"))
        _, _, prob, _ = threshold_gmm(score, n_components=3, seed=seed)
        panels.append((ct, cells, score, prob))
    if not panels:
        raise ValueError("No cell types with markers and enough cells")

    ncols = min(4, len(panels))
    nrows = -(-len(panels) // ncols)
    fig, axes = setup_figure(ncols=ncols, nrows=nrows, ax_width=3.6,
                             ax_height=3.2)
    rows = []
    for i, (ct, cells, score, prob) in enumerate(panels):
        ax = axes[i // ncols, i % ncols]
        c_pass = conf[cells] >= confidence_threshold
        m_pass = prob >= marker_probability_threshold
        ok = c_pass | m_pass
        ax.scatter(conf[cells][ok], score[ok], s=3, c="#2ca02c", alpha=0.4,
                   rasterized=True, linewidths=0)
        ax.scatter(conf[cells][~ok], score[~ok], s=3, c="#d62728", alpha=0.5,
                   rasterized=True, linewidths=0)
        ax.axvline(confidence_threshold, color="gray", lw=0.8, ls="--")
        ax.set_title(f"{ct}\n{ok.mean():.0%} pass", fontsize=8)
        ax.set_xlabel("confidence", fontsize=7)
        ax.set_ylabel("marker metagene", fontsize=7)
        rows.append({"cell_type": ct, "n_cells": cells.size,
                     "pct_pass": round(100 * float(ok.mean()), 1),
                     "pct_conf_pass": round(100 * float(c_pass.mean()), 1),
                     "pct_marker_pass": round(100 * float(m_pass.mean()), 1)})
    for j in range(len(panels), nrows * ncols):
        axes[j // ncols, j % ncols].axis("off")
    summary = pd.DataFrame(rows)
    if path:
        save_figure(fig, path)
    return fig, summary


def plot_marker_dotplot(
    adata,
    cell_type_column: str = "cell_type",
    markers: Optional[Dict[str, List[str]]] = None,
    max_markers_per_type: int = 3,
    path: Optional[Union[str, Path]] = None,
):
    """Dotplot: dot size = fraction expressing, color = mean expression."""
    if markers is None:
        from ..annotation.markers import load_canonical_markers

        markers = load_canonical_markers()
    var_index = {g: i for i, g in enumerate(adata.var_names)}
    labels = adata.obs[cell_type_column].astype(str)
    types = sorted(labels.unique())
    genes = []
    for ct in types:
        for g in [g for g in markers.get(ct, []) if g in var_index][
                :max_markers_per_type]:
            if g not in genes:
                genes.append(g)
    if not genes:
        raise ValueError("No canonical markers found in the panel")
    X = adata.X[:, [var_index[g] for g in genes]]
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)
    frac = np.zeros((len(types), len(genes)))
    mean = np.zeros((len(types), len(genes)))
    for i, ct in enumerate(types):
        sub = X[(labels == ct).to_numpy()]
        frac[i] = (sub > 0).mean(axis=0)
        mean[i] = sub.mean(axis=0)
    fig, axes = setup_figure(ax_width=max(6, 0.3 * len(genes)),
                             ax_height=max(4, 0.33 * len(types)))
    ax = axes[0, 0]
    yy, xx = np.mgrid[0:len(types), 0:len(genes)]
    scp = ax.scatter(xx.ravel(), yy.ravel(), s=frac.ravel() * 180 + 2,
                     c=mean.ravel(), cmap="Reds")
    ax.set_xticks(range(len(genes)))
    ax.set_xticklabels(genes, rotation=90, fontsize=7)
    ax.set_yticks(range(len(types)))
    ax.set_yticklabels(types, fontsize=8)
    ax.invert_yaxis()
    fig.colorbar(scp, ax=ax, label="mean expression")
    if path:
        return save_figure(fig, path)
    return fig


def plot_deg_heatmap(
    adata,
    cell_type_column: str = "cell_type",
    n_genes: int = 5,
    min_cells: int = 10,
    key: str = "rank_genes_groups",
    path: Optional[Union[str, Path]] = None,
):
    """Top DEG-per-type heatmap (z-scored means); runs the JAX wilcoxon
    ranking if ``uns[key]`` is absent (reference validation.py:732 runs
    scanpy's)."""
    labels = adata.obs[cell_type_column].astype(str)
    big = [t for t, c in labels.value_counts().items() if c >= min_cells]
    if len(big) < 2:
        raise ValueError(
            f"DEG heatmap needs ≥2 types with ≥{min_cells} cells")
    if key not in adata.uns:
        from ..stats.deg import rank_genes_groups

        rank_genes_groups(adata, cell_type_column, groups=big,
                          min_cells=min_cells, key_added=key)
    deg = adata.uns[key]
    genes, owners = [], []
    for grp in sorted(deg["names"]):
        for g in deg["names"][grp][:n_genes]:
            if g not in genes:
                genes.append(g)
                owners.append(grp)
    var_index = {g: i for i, g in enumerate(adata.var_names)}
    X = adata.X[:, [var_index[g] for g in genes]]
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)
    types = sorted(deg["names"])
    mat = np.vstack([X[(labels == t).to_numpy()].mean(axis=0)
                     for t in types])
    mu, sd = mat.mean(axis=0, keepdims=True), mat.std(axis=0, keepdims=True)
    matz = (mat - mu) / np.where(sd < 1e-9, 1.0, sd)
    fig, axes = setup_figure(ax_width=max(6, 0.25 * len(genes)),
                             ax_height=max(4, 0.33 * len(types)))
    ax = axes[0, 0]
    im = ax.imshow(matz, aspect="auto", cmap="RdBu_r", vmin=-2.5, vmax=2.5)
    ax.set_xticks(range(len(genes)))
    ax.set_xticklabels(genes, rotation=90, fontsize=6)
    ax.set_yticks(range(len(types)))
    ax.set_yticklabels(types, fontsize=8)
    fig.colorbar(im, ax=ax, label="mean expr (z)")
    ax.set_title(f"top {n_genes} DEGs per type (wilcoxon)")
    if path:
        return save_figure(fig, path)
    return fig


def plot_celltype_confidence_spatial(
    adata,
    cell_types=None,
    cell_type_column: str = "cell_type",
    confidence_column: str = "cell_type_confidence",
    spatial_key: str = "spatial",
    point_size: float = 2.0,
    seed: int = 0,
    path: Optional[Union[str, Path]] = None,
):
    """Per-type spatial confidence maps + a jittered confidence strip.

    Left: where the type sits in the tissue, colored by confidence (other
    cells dim gray). Right: jittered per-type confidence distribution
    (reference validation.py:590).
    """
    from ..core.rng import np_rng

    if spatial_key not in adata.obsm:
        raise ValueError(f"adata.obsm['{spatial_key}'] not found")
    coords = np.asarray(adata.obsm[spatial_key])[:, :2]
    labels = adata.obs[cell_type_column].astype(str)
    conf = adata.obs[confidence_column].to_numpy(float)
    if cell_types is None:
        cell_types = labels.value_counts().head(4).index.tolist()
    rng = np_rng(seed, "conf_jitter")

    nrows = len(cell_types)
    fig, axes = setup_figure(ncols=2, nrows=nrows, ax_width=5.0,
                             ax_height=3.6)
    for i, ct in enumerate(cell_types):
        m = (labels == ct).to_numpy()
        ax = axes[i, 0]
        ax.scatter(coords[~m, 0], coords[~m, 1], s=point_size * 0.4,
                   c="#dddddd", rasterized=True, linewidths=0)
        scp = ax.scatter(coords[m, 0], coords[m, 1], s=point_size,
                         c=conf[m], cmap="viridis", vmin=0, vmax=1,
                         rasterized=True, linewidths=0)
        fig.colorbar(scp, ax=ax, shrink=0.85)
        ax.set_aspect("equal")
        ax.set_title(f"{ct} (n={int(m.sum()):,})", fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])

        axj = axes[i, 1]
        y = conf[m]
        x = rng.uniform(-0.25, 0.25, y.size)
        axj.scatter(x, y, s=3, alpha=0.35, c="#1f77b4", rasterized=True,
                    linewidths=0)
        axj.set_xlim(-1, 1)
        axj.set_ylim(0, 1.02)
        axj.set_xticks([])
        axj.axhline(float(np.median(y)) if y.size else 0, color="#d62728",
                    lw=1.0)
        axj.set_ylabel(confidence_column, fontsize=7)
    if path:
        return save_figure(fig, path)
    return fig


def plot_ontology_mapping_table(
    adata,
    cell_type_column: str = "cell_type",
    ontology_column: str = "cell_type_ontology_term_id",
    path: Optional[Union[str, Path]] = None,
):
    """Figure-rendered table: label → CL ID / tier / score / cell count."""
    cols = [cell_type_column, ontology_column,
            f"{ontology_column}_tier", f"{ontology_column}_score"]
    for c in cols[:2]:
        if c not in adata.obs.columns:
            raise ValueError(f"Column '{c}' not found; run add_ontology_ids")
    df = adata.obs[[c for c in cols if c in adata.obs.columns]].copy()
    agg = (df.groupby(cell_type_column, observed=True)
           .agg({ontology_column: "first",
                 **({f"{ontology_column}_tier": "first"}
                    if f"{ontology_column}_tier" in df else {}),
                 **({f"{ontology_column}_score": "first"}
                    if f"{ontology_column}_score" in df else {})}))
    agg["n_cells"] = df[cell_type_column].value_counts()
    agg = agg.reset_index().sort_values("n_cells", ascending=False)
    fig, axes = setup_figure(ax_width=9,
                             ax_height=max(2.5, 0.3 * len(agg)))
    ax = axes[0, 0]
    ax.axis("off")
    table = ax.table(cellText=agg.round(3).astype(str).values,
                     colLabels=agg.columns, loc="center",
                     cellLoc="left")
    table.auto_set_font_size(False)
    table.set_fontsize(7)
    table.scale(1, 1.3)
    if path:
        return save_figure(fig, path)
    return fig


def generate_annotation_plots(
    adata,
    output_dir: Union[str, Path],
    cell_type_column: str = "cell_type",
    confidence_column: str = "cell_type_confidence",
    confidence_threshold: float = 0.8,
) -> Dict[str, Path]:
    """The standard 4-figure QC bundle (pipeline Stage 8)."""
    from .celltype import plot_celltype_distribution
    from .confidence import plot_confidence_by_celltype, plot_confidence_histogram

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: Dict[str, Path] = {}
    written["distribution"] = plot_celltype_distribution(
        adata, cell_type_column, path=out / "celltype_distribution.png")
    written["confidence_hist"] = plot_confidence_histogram(
        adata, confidence_column, threshold=confidence_threshold,
        path=out / "confidence_histogram.png")
    written["confidence_by_type"] = plot_confidence_by_celltype(
        adata, cell_type_column, confidence_column,
        path=out / "confidence_by_celltype.png")
    try:
        _, summary = plot_2d_validation(
            adata, cell_type_column, confidence_column,
            confidence_threshold=confidence_threshold,
            path=out / "validation_2d.png")
        summary.to_csv(out / "validation_summary.csv", index=False)
        written["validation_2d"] = out / "validation_2d.png"
    except ValueError as e:
        logger.warning(f"2D validation skipped: {e}")
    logger.info(f"QC plots → {out} ({len(written)} figures)")
    return written


# Reference-name alias (plotting/validation.py:954)
plot_ontology_mapping = plot_ontology_mapping_table


def plot_celltype_confidence(adata, label_column: str = "cell_type",
                             confidence_column: str = "cell_type_confidence",
                             spatial_key: str = "spatial",
                             threshold: float = 0.8,
                             max_cell_types: int = 20,
                             figsize=None, save=None):
    """Reference-spelled two-panel spatial + jitter confidence figure
    (ref plotting/validation.py:590); delegates to
    :func:`plot_celltype_confidence_spatial`."""
    del threshold, max_cell_types, figsize  # layout fixed by the delegate
    return plot_celltype_confidence_spatial(
        adata, cell_type_column=label_column,
        confidence_column=confidence_column, spatial_key=spatial_key,
        path=save)
