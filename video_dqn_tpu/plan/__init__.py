from .mapper import (
    ACT_FORWARD,
    ACT_LEFT,
    ACT_RIGHT,
    ACT_STOP,
    DepthMapperAndPlanner,
)

__all__ = [
    "ACT_FORWARD",
    "ACT_LEFT",
    "ACT_RIGHT",
    "ACT_STOP",
    "DepthMapperAndPlanner",
]
