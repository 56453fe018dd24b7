"""Annotation benchmarking figures: method comparison and agreement.

Parity with /root/reference/src/spatialcore/plotting/benchmark.py (method
comparison :29, confusion matrix :132, classification report :239, agreement
heatmap :313, silhouette by type :393) — built on numpy/matplotlib with the
metrics computed inline (no sklearn dependency for the figures themselves,
except silhouette which uses our pairwise kernel on a subsample).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np
import pandas as pd

from ..core.rng import np_rng
from .utils import save_figure, setup_figure


def _confusion(y_true, y_pred, labels):
    idx = {l: i for i, l in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)), np.int64)
    for t, p in zip(y_true, y_pred):
        if t in idx and p in idx:
            m[idx[t], idx[p]] += 1
    return m


def plot_method_comparison(
    adata,
    columns,
    normalize: bool = True,
    path: Optional[Union[str, Path]] = None,
):
    """Side-by-side cell-type composition across annotation methods.

    Grouped bars: one group per cell type, one bar per labeling column —
    the quick visual for 'did method B collapse the T cells?'.
    """
    from .utils import generate_celltype_palette

    if len(columns) < 2:
        raise ValueError("Need ≥2 columns to compare")
    comps = {}
    for col in columns:
        counts = adata.obs[col].astype(str).value_counts()
        comps[col] = counts / counts.sum() if normalize else counts
    types = sorted(set().union(*[c.index for c in comps.values()]))
    width = 0.8 / len(columns)
    fig, axes = setup_figure(ax_width=max(7, 0.45 * len(types)))
    ax = axes[0, 0]
    for mi, col in enumerate(columns):
        vals = [comps[col].get(t, 0.0) for t in types]
        ax.bar(np.arange(len(types)) + mi * width, vals, width, label=col)
    ax.set_xticks(np.arange(len(types)) + 0.4 - width / 2)
    ax.set_xticklabels(types, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel("fraction of cells" if normalize else "cells")
    ax.legend(frameon=False, fontsize=8)
    if path:
        return save_figure(fig, path)
    return fig


def plot_confusion_matrix(
    adata,
    true_column: str,
    pred_column: str,
    normalize: bool = True,
    path: Optional[Union[str, Path]] = None,
):
    """Row-normalized confusion matrix between two label columns."""
    yt = adata.obs[true_column].astype(str).to_numpy()
    yp = adata.obs[pred_column].astype(str).to_numpy()
    labels = sorted(set(yt) | set(yp))
    m = _confusion(yt, yp, labels).astype(float)
    if normalize:
        m = m / np.maximum(m.sum(axis=1, keepdims=True), 1)
    fig, axes = setup_figure(ax_width=max(6, 0.35 * len(labels)),
                             ax_height=max(5, 0.3 * len(labels)))
    ax = axes[0, 0]
    im = ax.imshow(m, cmap="Blues", vmin=0,
                   vmax=1 if normalize else None)
    ax.set_xticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticks(range(len(labels)))
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel(pred_column)
    ax.set_ylabel(true_column)
    fig.colorbar(im, ax=ax)
    if path:
        return save_figure(fig, path)
    return fig


def classification_report_table(
    adata,
    true_column: str,
    pred_column: str,
) -> pd.DataFrame:
    """Per-class precision / recall / F1 / support as a DataFrame."""
    yt = adata.obs[true_column].astype(str).to_numpy()
    yp = adata.obs[pred_column].astype(str).to_numpy()
    labels = sorted(set(yt))
    rows = []
    for lab in labels:
        tp = ((yt == lab) & (yp == lab)).sum()
        fp = ((yt != lab) & (yp == lab)).sum()
        fn = ((yt == lab) & (yp != lab)).sum()
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        rows.append({"cell_type": lab, "precision": round(prec, 3),
                     "recall": round(rec, 3), "f1": round(f1, 3),
                     "support": int((yt == lab).sum())})
    df = pd.DataFrame(rows)
    acc = (yt == yp).mean()
    df.attrs["accuracy"] = float(acc)
    return df


def plot_classification_report(
    adata,
    true_column: str,
    pred_column: str,
    path: Optional[Union[str, Path]] = None,
):
    """Bar chart of per-class F1 with overall accuracy in the title."""
    df = classification_report_table(adata, true_column, pred_column)
    fig, axes = setup_figure(ax_width=max(6, 0.4 * len(df)))
    ax = axes[0, 0]
    ax.bar(range(len(df)), df["f1"], color="#1f77b4")
    ax.set_xticks(range(len(df)))
    ax.set_xticklabels(df["cell_type"], rotation=60, ha="right", fontsize=7)
    ax.set_ylabel("F1")
    ax.set_ylim(0, 1)
    ax.set_title(f"accuracy = {df.attrs['accuracy']:.3f}")
    if path:
        return save_figure(fig, path)
    return fig


def agreement_metrics(y_a, y_b) -> Dict[str, float]:
    """NMI and ARI between two labelings (the reference's Python-vs-R
    validation metrics, SURVEY.md §6)."""
    from sklearn.metrics import (adjusted_rand_score,
                                 normalized_mutual_info_score)

    return {"nmi": float(normalized_mutual_info_score(y_a, y_b)),
            "ari": float(adjusted_rand_score(y_a, y_b))}


def plot_agreement_heatmap(
    adata,
    column_a: str,
    column_b: str,
    path: Optional[Union[str, Path]] = None,
):
    """Cross-tab heatmap of two labelings with NMI/ARI in the title."""
    ya = adata.obs[column_a].astype(str).to_numpy()
    yb = adata.obs[column_b].astype(str).to_numpy()
    la = sorted(set(ya))
    lb = sorted(set(yb))
    m = np.zeros((len(la), len(lb)), float)
    ia = {l: i for i, l in enumerate(la)}
    ib = {l: i for i, l in enumerate(lb)}
    for a, b in zip(ya, yb):
        m[ia[a], ib[b]] += 1
    m = m / np.maximum(m.sum(axis=1, keepdims=True), 1)
    met = agreement_metrics(ya, yb)
    fig, axes = setup_figure(ax_width=max(6, 0.35 * len(lb)),
                             ax_height=max(5, 0.3 * len(la)))
    ax = axes[0, 0]
    im = ax.imshow(m, cmap="Purples", vmin=0, vmax=1)
    ax.set_xticks(range(len(lb)))
    ax.set_xticklabels(lb, rotation=90, fontsize=7)
    ax.set_yticks(range(len(la)))
    ax.set_yticklabels(la, fontsize=7)
    ax.set_xlabel(column_b)
    ax.set_ylabel(column_a)
    ax.set_title(f"NMI={met['nmi']:.3f}  ARI={met['ari']:.3f}")
    fig.colorbar(im, ax=ax)
    if path:
        return save_figure(fig, path)
    return fig


def plot_silhouette_by_type(
    adata,
    cell_type_column: str = "cell_type",
    use_rep: str = "X",
    max_cells: int = 5000,
    seed: int = 0,
    path: Optional[Union[str, Path]] = None,
):
    """Mean silhouette per cell type on a seeded subsample."""
    import scipy.sparse as sp
    from sklearn.metrics import silhouette_samples

    X = adata.obsm[use_rep] if use_rep in adata.obsm else adata.X
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, np.float32)
    labels = adata.obs[cell_type_column].astype(str).to_numpy()
    if X.shape[0] > max_cells:
        idx = np_rng(seed, "silhouette").choice(X.shape[0], max_cells,
                                                replace=False)
        X, labels = X[idx], labels[idx]
    keep = pd.Series(labels).map(
        pd.Series(labels).value_counts() >= 2).to_numpy()
    X, labels = X[keep], labels[keep]
    if len(set(labels)) < 2:
        raise ValueError("Silhouette needs ≥2 types with ≥2 cells")
    sil = silhouette_samples(X, labels)
    df = pd.DataFrame({"type": labels, "sil": sil})
    means = df.groupby("type")["sil"].mean().sort_values(ascending=False)
    fig, axes = setup_figure(ax_width=max(6, 0.4 * len(means)))
    ax = axes[0, 0]
    ax.bar(range(len(means)), means.values,
           color=np.where(means.values >= 0, "#2ca02c", "#d62728"))
    ax.axhline(0, color="gray", lw=0.8)
    ax.set_xticks(range(len(means)))
    ax.set_xticklabels(means.index, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel("mean silhouette")
    if path:
        return save_figure(fig, path)
    return fig
