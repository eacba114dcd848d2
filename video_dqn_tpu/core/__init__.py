from .config import ConfigNode, ConfigError, load_with_inherit
from .defaults import get_cfg_defaults, VALID_VALUES
from .experiment import ExperimentConfig
from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint_step,
    checkpoint_path,
)
from .disk_logger import DiskLogger, DiskReader
from .metrics import MetricsWriter, read_metrics

__all__ = [
    "ConfigNode",
    "ConfigError",
    "load_with_inherit",
    "get_cfg_defaults",
    "VALID_VALUES",
    "ExperimentConfig",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
    "checkpoint_path",
    "DiskLogger",
    "DiskReader",
    "MetricsWriter",
    "read_metrics",
]
