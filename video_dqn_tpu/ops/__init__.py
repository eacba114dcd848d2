from .image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    imagenet_preprocess,
    normalize_imagenet,
    resize_smallest_edge,
    to_imgnet,
)
from .scans import (
    discounted_value_targets,
    steps_to_reward,
    steps_to_reward_multiclass,
    steps_to_reward_negative,
    steps_to_reward_negative_multiclass,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "center_crop",
    "imagenet_preprocess",
    "normalize_imagenet",
    "resize_smallest_edge",
    "to_imgnet",
    "discounted_value_targets",
    "steps_to_reward",
    "steps_to_reward_multiclass",
    "steps_to_reward_negative",
    "steps_to_reward_negative_multiclass",
]
