"""Annotation-confidence figures.

Parity with /root/reference/src/spatialcore/plotting/confidence.py
(histogram :30, by-celltype :135, violin :247, model contribution :341).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union


from .utils import generate_celltype_palette, save_figure, setup_figure


def plot_confidence_histogram(
    adata,
    confidence_column: str = "cell_type_confidence",
    threshold: Optional[float] = None,
    bins: int = 60,
    path: Optional[Union[str, Path]] = None,
):
    """Distribution of per-cell confidence with optional threshold line."""
    conf = adata.obs[confidence_column].dropna().to_numpy(float)
    fig, axes = setup_figure()
    ax = axes[0, 0]
    ax.hist(conf, bins=bins, color="#1f77b4", alpha=0.85)
    if threshold is not None:
        below = float((conf < threshold).mean())
        ax.axvline(threshold, color="#d62728", lw=2,
                   label=f"threshold {threshold} ({below:.1%} below)")
        ax.legend(frameon=False)
    ax.set_xlabel(confidence_column)
    ax.set_ylabel("cells")
    if path:
        return save_figure(fig, path)
    return fig


def plot_confidence_by_celltype(
    adata,
    cell_type_column: str = "cell_type",
    confidence_column: str = "cell_type_confidence",
    kind: str = "box",
    path: Optional[Union[str, Path]] = None,
):
    """Per-type confidence distributions (box or violin), sorted by median."""
    df = adata.obs[[cell_type_column, confidence_column]].dropna()
    order = (df.groupby(cell_type_column, observed=True)[confidence_column]
             .median().sort_values(ascending=False).index.tolist())
    groups = [df.loc[df[cell_type_column] == ct, confidence_column
                     ].to_numpy(float) for ct in order]
    palette = generate_celltype_palette(order)
    fig, axes = setup_figure(ax_width=max(6, 0.45 * len(order)))
    ax = axes[0, 0]
    if kind == "violin":
        parts = ax.violinplot(groups, showmedians=True)
        for body, ct in zip(parts["bodies"], order):
            body.set_facecolor(palette[ct])
    else:
        bp = ax.boxplot(groups, patch_artist=True, showfliers=False)
        for patch, ct in zip(bp["boxes"], order):
            patch.set_facecolor(palette[ct])
    ax.set_xticks(range(1, len(order) + 1))
    ax.set_xticklabels(order, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel(confidence_column)
    if path:
        return save_figure(fig, path)
    return fig


def plot_model_contribution(
    adata,
    model_column: str = "cell_type_model",
    path: Optional[Union[str, Path]] = None,
):
    """Share of cells won by each ensemble model."""
    if model_column not in adata.obs.columns:
        raise ValueError(f"Column '{model_column}' not found")
    counts = adata.obs[model_column].value_counts()
    fig, axes = setup_figure()
    ax = axes[0, 0]
    ax.bar(range(len(counts)), counts.values, color="#1f77b4")
    ax.set_xticks(range(len(counts)))
    ax.set_xticklabels(counts.index, rotation=30, ha="right")
    ax.set_ylabel("cells won")
    ax.set_title("ensemble model contribution")
    if path:
        return save_figure(fig, path)
    return fig


def plot_confidence_violin(adata, **kwargs):
    """Violin variant of the per-type confidence figure (reference name)."""
    kwargs.setdefault("kind", "violin")
    return plot_confidence_by_celltype(adata, **kwargs)


# Reference-name alias
plot_celltype_confidence = plot_confidence_by_celltype
