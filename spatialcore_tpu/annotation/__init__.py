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

__all__ = [
    "evaluate_ontology_expression",
    "DEFAULT_ONTOLOGY_COLUMNS",
]


def __getattr__(name):
    import importlib

    try:
        return importlib.import_module(f".{name}", __name__)
    except ImportError as e:
        raise AttributeError(name) from e
