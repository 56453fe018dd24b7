"""Threshold-based classification on metagene scores.

API parity with the reference's ``spatialcore.stats``
(/root/reference/src/spatialcore/stats/__init__.py): the public entry point is
``classify_by_threshold``; the numeric kernels (metagene aggregation, KS-style
and GMM thresholds) live in ``thresholding`` as pure JAX, replacing the
reference's numpy/scipy/sklearn implementations
(/root/reference/src/spatialcore/stats/_thresholding.py).
"""

from .classify import classify_by_threshold
from .deg import rank_genes_groups
from .thresholding import (
    GMM1D,
    compute_metagene_score,
    gmm_posterior,
    threshold_gmm,
    threshold_ks,
)

__all__ = [
    "classify_by_threshold",
    "rank_genes_groups",
    "compute_metagene_score",
    "threshold_ks",
    "threshold_gmm",
    "gmm_posterior",
    "GMM1D",
]
