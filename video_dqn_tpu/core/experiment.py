"""Folder-as-experiment semantics.

Parity with the reference ExperimentConfig
(/root/reference/experiment_config.py:12-51): an experiment is a folder
containing `config.yml`; loading merges it over the defaults, validates,
freezes, and exposes every key as an attribute. Run logs go to an
auto-incremented `run<N>` subfolder (resume reuses the latest run).

TPU-native difference: there is no CUDA device handle; instead the
experiment owns the `jax` device mesh description (resolved lazily by the
trainer) and a metrics writer that prefers tensorboardX when present and
always mirrors scalars to `metrics.jsonl` for dependency-free reads.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Optional

from .config import ConfigNode
from .defaults import VALID_VALUES, get_cfg_defaults
from .metrics import MetricsWriter


class ExperimentConfig:
    def __init__(
        self,
        folder: str,
        remove: bool = False,
        resume: bool = False,
        run_prefix: str = "run",
        tensorboard: bool = True,
        overrides: Optional[list] = None,
    ):
        self.folder = folder

        if remove:
            for f in os.listdir(folder):
                if re.match(f"^{run_prefix}\\d+$", f):
                    shutil.rmtree(os.path.join(folder, f), ignore_errors=True)

        max_run = 0
        for f in os.listdir(folder):
            m = re.match(f"^{run_prefix}(\\d+)$", f)
            if m:
                max_run = max(max_run, int(m.group(1)))
        if not resume:
            max_run += 1
        self.run_dir = os.path.join(folder, f"{run_prefix}{max_run}")

        cfg = get_cfg_defaults()
        cfg.merge_from_file(os.path.join(folder, "config.yml"))
        if overrides:
            cfg.merge_from_list(overrides)
        cfg.validate(VALID_VALUES)
        cfg.freeze()
        self.cfg = cfg
        for k in cfg:
            setattr(self, k, cfg[k])

        self.writer = MetricsWriter(self.run_dir, tensorboard=tensorboard)

    @property
    def models_dir(self) -> str:
        return os.path.join(self.folder, "models")

    def write_config_log(self) -> None:
        """Dump the resolved config to `<folder>/log`
        (reference: train_q_network.py:283-284)."""
        with open(os.path.join(self.folder, "log"), "w") as f:
            f.write(f"Running with config ({self.cfg.dump()})")
