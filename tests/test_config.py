import os

import pytest
import yaml

from video_dqn_tpu.core import (
    ConfigError,
    ConfigNode,
    ExperimentConfig,
    get_cfg_defaults,
    load_with_inherit,
)


def test_defaults_match_reference_keys():
    # Every key the reference defines (defaults.py:5-37) must exist with the
    # same default value so published experiment configs load unchanged.
    cfg = get_cfg_defaults()
    expected = {
        "PANORAMA": True,
        "SEED": 0,
        "CLASS_LABEL": "toilet",
        "LOSS_CLIP": "none",
        "ARCHITECTURE": "basic",
        "ONE_ACTION": False,
        "USE_INVERSE_ACTIONS": False,
        "VALUE_LEARNING": False,
        "PREVIOUS_IMAGES": False,
        "GAMMA": 0.9,
        "LINEAR": False,
        "LEARNING_RATE": 1e-3,
        "NUM_STEPS": 100000,
        "TARGET_UPDATE_INTERVAL": 8000,
        "CHECKPOINT_INTERVAL": 2000,
        "CONFIDENCE_REWARD": False,
        "DISTRIBUTIONAL": False,
        "VISUALIZATION_DATA_ROOT": "",
    }
    for k, v in expected.items():
        assert cfg[k] == v, k


def test_merge_type_checking(tmp_path):
    cfg = get_cfg_defaults()
    cfg.merge_from_dict({"GAMMA": 0.99, "NUM_STEPS": 300000})
    assert cfg.GAMMA == 0.99
    with pytest.raises(ConfigError):
        cfg.merge_from_dict({"GAMMA": "high"})
    with pytest.raises(ConfigError):
        cfg.merge_from_dict({"NOT_A_KEY": 1})


def test_freeze():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(ConfigError):
        cfg.SEED = 5
    cfg.defrost()
    cfg.SEED = 5
    assert cfg.SEED == 5


def test_clone_independent():
    a = get_cfg_defaults()
    b = a.clone()
    b.SEED = 99
    assert a.SEED == 0


def test_merge_from_list_nested():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TPU.BATCH_SIZE", "64", "SEED", "7"])
    assert cfg.TPU.BATCH_SIZE == 64
    assert cfg.SEED == 7


def test_inherit_chain(tmp_path):
    base = tmp_path / "base.yml"
    base.write_text(yaml.safe_dump({"GAMMA": 0.5, "SEED": 1}))
    child = tmp_path / "child.yml"
    child.write_text(yaml.safe_dump({"INHERIT": "base.yml", "SEED": 2}))
    cfg = load_with_inherit(str(child), get_cfg_defaults())
    assert cfg.GAMMA == 0.5  # from parent
    assert cfg.SEED == 2  # child overrides


def test_inherit_cycle_detected(tmp_path):
    a = tmp_path / "a.yml"
    b = tmp_path / "b.yml"
    a.write_text(yaml.safe_dump({"INHERIT": "b.yml"}))
    b.write_text(yaml.safe_dump({"INHERIT": "a.yml"}))
    with pytest.raises(ConfigError):
        load_with_inherit(str(a), get_cfg_defaults())


def test_experiment_folder_semantics(tmp_path):
    folder = tmp_path / "exp"
    folder.mkdir()
    (folder / "config.yml").write_text(
        yaml.safe_dump({"GAMMA": 0.99, "LOSS_CLIP": "rect", "SEED": 4})
    )
    e1 = ExperimentConfig(str(folder), tensorboard=False)
    assert e1.GAMMA == 0.99
    assert e1.cfg.is_frozen
    assert e1.run_dir.endswith("run1")
    # second (non-resume) load increments the run dir
    e2 = ExperimentConfig(str(folder), tensorboard=False)
    assert e2.run_dir.endswith("run2")
    # resume reuses the latest
    e3 = ExperimentConfig(str(folder), resume=True, tensorboard=False)
    assert e3.run_dir.endswith("run2")
    e1.write_config_log()
    assert os.path.exists(folder / "log")


def test_experiment_validates_loss_clip(tmp_path):
    folder = tmp_path / "exp"
    folder.mkdir()
    (folder / "config.yml").write_text(yaml.safe_dump({"LOSS_CLIP": "bogus"}))
    with pytest.raises(ConfigError):
        ExperimentConfig(str(folder), tensorboard=False)


def test_real_data_config_loads():
    # The repo ships a port of the published experiment config; it must parse.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(here, "configs/experiments/real_data/config.yml"))
    assert cfg.NUM_STEPS == 300000
    assert cfg.ARCHITECTURE == "extra_capacity"
    assert cfg.GAMMA == 0.99
    assert cfg.SEED == 4
