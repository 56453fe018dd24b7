"""Cell-type composition figures.

Parity with /root/reference/src/spatialcore/plotting/celltype.py
(distribution bar :29, pie :135, embedding scatter :216).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np
import pandas as pd

from .utils import generate_celltype_palette, save_figure, setup_figure


def plot_celltype_distribution(
    adata,
    cell_type_column: str = "cell_type",
    top_n: Optional[int] = None,
    path: Optional[Union[str, Path]] = None,
    log_scale: bool = False,
):
    """Horizontal bar chart of cell counts per type, largest first."""
    counts = adata.obs[cell_type_column].value_counts()
    if top_n:
        counts = counts.head(top_n)
    palette = generate_celltype_palette(counts.index)
    fig, axes = setup_figure(ax_width=7, ax_height=max(3, 0.3 * len(counts)))
    ax = axes[0, 0]
    ax.barh(range(len(counts)), counts.values[::-1],
            color=[palette[c] for c in counts.index[::-1]])
    ax.set_yticks(range(len(counts)))
    ax.set_yticklabels(counts.index[::-1], fontsize=8)
    ax.set_xlabel("cells")
    if log_scale:
        ax.set_xscale("log")
    ax.set_title(f"{cell_type_column}: {len(counts)} types, "
                 f"{int(counts.sum()):,} cells")
    if path:
        return save_figure(fig, path)
    return fig


def plot_celltype_pie(
    adata,
    cell_type_column: str = "cell_type",
    min_pct: float = 1.0,
    path: Optional[Union[str, Path]] = None,
):
    """Pie chart; types below ``min_pct`` percent collapse into 'Other'."""
    counts = adata.obs[cell_type_column].value_counts()
    frac = counts / counts.sum() * 100
    major = counts[frac >= min_pct]
    other = counts[frac < min_pct].sum()
    if other > 0:
        major = pd.concat([major, pd.Series({"Other": other})])
    palette = generate_celltype_palette(major.index)
    fig, axes = setup_figure(ax_width=6, ax_height=6)
    ax = axes[0, 0]
    ax.pie(major.values, labels=major.index,
           colors=[palette[c] for c in major.index],
           autopct="%1.1f%%", textprops={"fontsize": 8})
    ax.set_title(cell_type_column)
    if path:
        return save_figure(fig, path)
    return fig


def plot_celltype_embedding(
    adata,
    basis: str = "spatial",
    cell_type_column: str = "cell_type",
    point_size: float = 2.0,
    path: Optional[Union[str, Path]] = None,
):
    """Scatter of an obsm embedding colored by cell type (rasterized)."""
    if basis not in adata.obsm:
        raise ValueError(f"adata.obsm['{basis}'] not found")
    coords = np.asarray(adata.obsm[basis])[:, :2]
    labels = adata.obs[cell_type_column].astype(str)
    palette = generate_celltype_palette(labels.unique())
    fig, axes = setup_figure(ax_width=8, ax_height=8)
    ax = axes[0, 0]
    for ct in sorted(labels.unique()):
        m = (labels == ct).to_numpy()
        ax.scatter(coords[m, 0], coords[m, 1], s=point_size, c=palette[ct],
                   label=ct, rasterized=True, linewidths=0)
    ax.set_aspect("equal")
    ax.legend(markerscale=4, fontsize=7, loc="center left",
              bbox_to_anchor=(1.0, 0.5), frameon=False)
    ax.set_title(f"{cell_type_column} on {basis}")
    if path:
        return save_figure(fig, path)
    return fig


def plot_celltype_umap(adata, basis: str = "X_umap", **kwargs):
    """Embedding scatter under the reference's UMAP-specific name."""
    return plot_celltype_embedding(adata, basis=basis, **kwargs)
