from .policy_config import get_eval_defaults, load_file, name_from_config
from .evaluate import (
    check_movement,
    fuse_detector_scores,
    make_geodesic_scorer,
    make_model_scorer,
    ours_evaluate,
)
from .runner import build_detector_from_config, load_eval_model, run_policy
from .results import display_results

__all__ = [
    "get_eval_defaults",
    "load_file",
    "name_from_config",
    "check_movement",
    "fuse_detector_scores",
    "make_geodesic_scorer",
    "make_model_scorer",
    "ours_evaluate",
    "build_detector_from_config",
    "load_eval_model",
    "run_policy",
    "display_results",
]
