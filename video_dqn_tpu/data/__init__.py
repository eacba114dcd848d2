from .schema import (
    CLASS_LABELS,
    DETECTION_THRESHOLDS,
    arrays_from_frame,
    multi_add,
    multi_get,
    read_feather,
    validate_schema,
    write_feather,
)
from .qlearning import QLearningBatcher
from .synthetic import make_synthetic_dataset, synthetic_batch

__all__ = [
    "CLASS_LABELS",
    "DETECTION_THRESHOLDS",
    "arrays_from_frame",
    "multi_add",
    "multi_get",
    "read_feather",
    "validate_schema",
    "write_feather",
    "QLearningBatcher",
    "make_synthetic_dataset",
    "synthetic_batch",
]
