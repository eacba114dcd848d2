"""Simulation task configuration.

Typed equivalent of the reference's habitat config shim + task yaml
(/root/reference/configs/habitat_config.py:5-39 and
configs/tasks/pointnav_rgbd.yaml): RGB+DEPTH 224x224 sensors, 30-degree
turns, 0.25 m forward steps, SPL success distance, optional extra sensor
nodes — loadable from yaml with comma-separated multi-file merge.
"""

from __future__ import annotations

from typing import Optional

from video_dqn_tpu.core.config import ConfigNode


def get_sim_defaults() -> ConfigNode:
    return ConfigNode(
        {
            "SIMULATOR": ConfigNode(
                {
                    "TURN_ANGLE": 30,
                    "FORWARD_STEP_SIZE": 0.25,
                    "RGB_SENSOR": ConfigNode({"WIDTH": 224, "HEIGHT": 224, "HFOV": 90}),
                    "DEPTH_SENSOR": ConfigNode(
                        {
                            "WIDTH": 224,
                            "HEIGHT": 224,
                            "HFOV": 90,
                            "MIN_DEPTH": 0.0,
                            "MAX_DEPTH": 10.0,
                        }
                    ),
                    "SENSORS": ["RGB_SENSOR", "DEPTH_SENSOR"],
                    "AGENT_HEIGHT": 1.25,   # navmesh regen constant
                    "MAX_CLIMB": 0.05,      # (regenerate_navmeshes.rb:12-21)
                    "ALLOW_STAIRS": True,
                }
            ),
            "TASK": ConfigNode(
                {
                    "SUCCESS_DISTANCE": 0.2,
                    "MEASUREMENTS": ["SPL"],
                    "DETECTRON_SENSOR": ConfigNode({"ENABLED": False}),
                    "MULTI_SPL": ConfigNode({"ENABLED": False}),
                }
            ),
            "ENVIRONMENT": ConfigNode({"MAX_EPISODE_STEPS": int(1e6)}),
        }
    )


def get_config(config_paths: Optional[str] = None, opts: Optional[list] = None) -> ConfigNode:
    """Comma-separated multi-file merge over the defaults (the reference
    shim's get_config contract, configs/habitat_config.py:13-39)."""
    cfg = get_sim_defaults()
    if config_paths:
        for path in config_paths.split(","):
            cfg.merge_from_file(path.strip())
    if opts:
        cfg.merge_from_list(opts)
    cfg.freeze()
    return cfg


def env_kwargs_from_config(cfg: ConfigNode) -> dict:
    """Translate a sim config into FakeNavEnv/renderer constructor args."""
    sim = cfg.SIMULATOR
    return {
        "image_size": sim.RGB_SENSOR.WIDTH,
        "fov_deg": float(sim.RGB_SENSOR.HFOV),
        "turn_angle_deg": float(sim.TURN_ANGLE),
        "forward_step": float(sim.FORWARD_STEP_SIZE),
        "max_depth": float(sim.DEPTH_SENSOR.MAX_DEPTH),
    }
