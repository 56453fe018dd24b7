"""QC and validation figures (matplotlib; platform-neutral).

Mirrors the reference's ``spatialcore.plotting`` surface
(/root/reference/src/spatialcore/plotting/__init__.py). Figures are built
lazily — importing this package does not import matplotlib.
"""

from .utils import (
    COLORBLIND_PALETTE,
    DEFAULT_PALETTE,
    despine,
    generate_celltype_palette,
    save_figure,
    setup_figure,
)

__all__ = [
    "DEFAULT_PALETTE", "COLORBLIND_PALETTE", "generate_celltype_palette",
    "setup_figure", "save_figure", "despine",
]


def __getattr__(name):
    # Lazy submodule access: plotting.gpairs etc.
    import importlib

    try:
        return importlib.import_module(f".{name}", __name__)
    except ImportError as e:
        raise AttributeError(name) from e
