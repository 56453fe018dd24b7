"""Spatial statistics: autocorrelation, neighborhoods, niches, domains."""

from .neighborhoods import (compute_neighborhood_profile, identify_niches,
                            niche_stability)
from .domains import detect_platform, get_domain_summary, make_spatial_domains
from .distance import calculate_domain_distances, get_distance_matrix
from .ripley import (clark_evans, co_occurrence,
                     cross_type_ripleys_k, ripleys_k)
from .nhood import neighborhood_enrichment
from .autocorrelation import (
    getis_ord_gi,
    moran_correlogram,
    join_count_statistics,
    local_gearys_c,
    local_gearys_c_multivariate,
    local_join_counts,
    build_spatial_weights,
    gearys_c,
    global_autocorrelation,
    lees_l,
    lees_l_local,
    local_morans_i,
    morans_i,
)

__all__ = [
    "build_spatial_weights", "morans_i", "gearys_c", "global_autocorrelation",
    "local_morans_i",
    "lees_l", "lees_l_local", "join_count_statistics", "getis_ord_gi",
    "moran_correlogram",
    "local_gearys_c",
    "local_gearys_c_multivariate", "local_join_counts",
    "compute_neighborhood_profile", "identify_niches", "niche_stability",
    "make_spatial_domains", "get_domain_summary", "detect_platform",
    "calculate_domain_distances", "get_distance_matrix",
    "ripleys_k", "cross_type_ripleys_k", "clark_evans",
    "neighborhood_enrichment",
    "co_occurrence",
]
