"""Cell-type annotation: ontology tools, training, and prediction.

TPU-native replacement for the reference's ``spatialcore.annotation``
(/root/reference/src/spatialcore/annotation/__init__.py): the CellTypist
SGD classifier becomes a JAX/optax multinomial logistic regression; the
ontology matcher, label patterns, and boolean-expression evaluator are
behavioral ports (string work stays on host, SURVEY.md §7 decision 5).
"""

from .expression import (
    DEFAULT_ONTOLOGY_COLUMNS,
    evaluate_ontology_expression,
)
from .model import CellTypeModel
from .training import (
    DEFAULT_EXCLUDE_LABELS,
    HIGH_CONTRAST_PALETTE,
    combine_references,
    ensure_normalized,
    generate_color_scheme,
    save_model_artifacts,
    subsample_balanced,
    train_cell_type_model,
    train_celltypist_model,
)
from .annotate import (
    TISSUE_MODEL_PRESETS,
    annotate_cells,
    annotate_celltypist,
    get_models_for_tissue,
)
from .confidence import (
    ConfidenceMethod,
    extract_decision_scores,
    filter_by_marker_validation,
    filter_low_confidence,
    filter_low_count_types,
    transform_confidence,
)
from .markers import get_markers_for_type, load_canonical_markers
from .pipeline import TrainingConfig, train_and_annotate, train_and_annotate_config
from .loading import load_adata_backed, stratified_sample_indices
from .acquisition import acquire_reference, resolve_uri_to_local
from .discovery import (
    DiscoveredDataset,
    discover_training_data,
    make_metadata_template,
    query_metadata,
)
from .ontology import (
    BLACKLISTED_CL_IDS,
    SKIP_LABELS,
    add_ontology_ids,
    extract_biological_tokens,
    load_ontology_index,
    search_ontology_index,
)
from .patterns import CELL_TYPE_PATTERNS, get_canonical_term
from .validation import (
    CellTypeValidationResult,
    ValidationIssue,
    check_label_ontology_consistency,
    validate_cell_type_column,
    validate_multiple_columns,
)

__all__ = [
    "train_and_annotate", "train_and_annotate_config", "TrainingConfig",
    "load_adata_backed", "stratified_sample_indices",
    "acquire_reference", "resolve_uri_to_local",
    "discover_training_data", "DiscoveredDataset",
    "make_metadata_template", "query_metadata",
    "add_ontology_ids", "search_ontology_index", "load_ontology_index",
    "extract_biological_tokens", "SKIP_LABELS", "BLACKLISTED_CL_IDS",
    "CELL_TYPE_PATTERNS", "get_canonical_term",
    "validate_cell_type_column", "validate_multiple_columns",
    "check_label_ontology_consistency", "CellTypeValidationResult",
    "ValidationIssue",
    "evaluate_ontology_expression", "DEFAULT_ONTOLOGY_COLUMNS",
    "CellTypeModel", "train_cell_type_model", "train_celltypist_model",
    "combine_references", "subsample_balanced", "ensure_normalized",
    "save_model_artifacts", "generate_color_scheme",
    "DEFAULT_EXCLUDE_LABELS", "HIGH_CONTRAST_PALETTE",
    "annotate_cells", "annotate_celltypist", "get_models_for_tissue",
    "TISSUE_MODEL_PRESETS",
    "transform_confidence", "extract_decision_scores",
    "filter_low_confidence", "filter_low_count_types",
    "filter_by_marker_validation", "ConfidenceMethod",
    "load_canonical_markers", "get_markers_for_type",
]


def __getattr__(name):
    import importlib

    try:
        return importlib.import_module(f".{name}", __name__)
    except ImportError as e:
        raise AttributeError(name) from e
