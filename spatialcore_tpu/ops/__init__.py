"""TPU compute kernels: graphs, autocorrelation, clustering, thresholds."""

from .fdr import apply_fdr, benjamini_hochberg, bonferroni
from .graph import (
    SpatialGraph,
    build_graph,
    graph_moments,
    knn_exact,
    knn_grid,
    radius_neighbors,
    spatial_lag,
)
from .lee import LeesLResult, lees_l_pairs
from .pallas_knn import pallas_knn
from .moran import (
    LocalMoranResult,
    QUADRANT_LABELS,
    classify_quadrants,
    geary_analytic_moments,
    geary_observed,
    local_moran,
    moran_analytic_moments,
    moran_observed,
    p_from_z,
    permutation_test_global,
    standardize,
)

__all__ = [
    "SpatialGraph", "build_graph", "graph_moments", "knn_exact", "knn_grid",
    "radius_neighbors", "spatial_lag", "pallas_knn",
    "standardize", "moran_observed", "geary_observed",
    "moran_analytic_moments", "geary_analytic_moments", "p_from_z",
    "permutation_test_global", "local_moran", "LocalMoranResult",
    "classify_quadrants", "QUADRANT_LABELS",
    "lees_l_pairs", "LeesLResult",
    "apply_fdr", "benjamini_hochberg", "bonferroni",
]
