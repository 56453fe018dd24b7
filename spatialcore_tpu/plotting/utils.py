"""Shared plotting utilities: palettes, figure setup/save, despining.

Parity with /root/reference/src/spatialcore/plotting/utils.py (palettes,
``generate_celltype_palette``, ``setup_figure``, ``save_figure``,
``despine``) — built independently on matplotlib with deterministic color
assignment (stable hash of the label order, not dict iteration order).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

# 20 visually distinct colors for categorical cell-type maps.
DEFAULT_PALETTE: List[str] = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
    "#aec7e8", "#ffbb78", "#98df8a", "#ff9896", "#c5b0d5",
    "#c49c94", "#f7b6d2", "#c7c7c7", "#dbdb8d", "#9edae5",
]

# Wong (2011) colorblind-safe palette + extensions.
COLORBLIND_PALETTE: List[str] = [
    "#000000", "#E69F00", "#56B4E9", "#009E73", "#F0E442",
    "#0072B2", "#D55E00", "#CC79A7", "#999999", "#44AA99",
    "#117733", "#882255", "#661100", "#88CCEE", "#DDCC77",
]


def generate_celltype_palette(
    celltypes: Sequence[str],
    palette: Optional[Sequence[str]] = None,
    colorblind: bool = False,
) -> Dict[str, str]:
    """Deterministic label→hex mapping: sorted labels, cycled palette."""
    base = list(palette) if palette is not None else (
        COLORBLIND_PALETTE if colorblind else DEFAULT_PALETTE)
    labels = sorted(set(str(c) for c in celltypes))
    return {lab: base[i % len(base)] for i, lab in enumerate(labels)}


def save_palette(palette: Dict[str, str], path: Union[str, Path]) -> Path:
    """Persist a label→hex palette as JSON (stable across runs/figures)."""
    import json

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(palette, f, indent=2, sort_keys=True)
    return path


def load_palette(path: Union[str, Path]) -> Dict[str, str]:
    """Load a label→hex palette saved by :func:`save_palette`."""
    import json

    with open(path) as f:
        data = json.load(f)
    return {str(k): str(v) for k, v in data.items()}


def setup_figure(ncols: int = 1, nrows: int = 1, ax_width: float = 5.0,
                 ax_height: float = 4.5, dpi: int = 100, **kwargs):
    """Create a (fig, axes) grid with sane defaults for QC figures."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        nrows, ncols, figsize=(ax_width * ncols, ax_height * nrows),
        dpi=dpi, squeeze=False, **kwargs)
    return fig, axes


def save_figure(fig, path: Union[str, Path], dpi: int = 150,
                close: bool = True) -> Path:
    """Save with tight bbox; creates parent dirs; returns the path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    if close:
        import matplotlib.pyplot as plt

        plt.close(fig)
    return path


def despine(ax, top: bool = True, right: bool = True, left: bool = False,
            bottom: bool = False) -> None:
    """Hide the requested axis spines."""
    for side, off in (("top", top), ("right", right), ("left", left),
                      ("bottom", bottom)):
        if off:
            ax.spines[side].set_visible(False)


# Reference-name aliases
save_celltype_palette = save_palette
load_celltype_palette = load_palette
setup_multi_figure = setup_figure


def close_figure(fig) -> None:
    """Close a matplotlib figure (frees memory in long loops)."""
    import matplotlib.pyplot as plt

    plt.close(fig)


def format_axis_labels(ax, rotation: int = 60, fontsize: int = 7) -> None:
    """Rotate/shrink x tick labels (the QC-figure default styling)."""
    for lab in ax.get_xticklabels():
        lab.set_rotation(rotation)
        lab.set_ha("right")
        lab.set_fontsize(fontsize)


# reference-spelled alias (ref plotting/utils.py:126)
load_celltype_palette = load_palette


def setup_multi_figure(nrows: int = 1, ncols: int = 1, figsize=None,
                       dpi: int = 150, sharex: bool = False,
                       sharey: bool = False):
    """Multi-panel figure; auto-sizes 4×4 inches per panel (ref
    plotting/utils.py:227)."""
    import matplotlib.pyplot as plt

    if figsize is None:
        figsize = (4 * ncols, 4 * nrows)
    fig, axes = plt.subplots(nrows, ncols, figsize=figsize, dpi=dpi,
                             sharex=sharex, sharey=sharey, squeeze=False)
    return fig, axes
