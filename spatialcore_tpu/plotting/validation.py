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
