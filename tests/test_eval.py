"""Evaluation-harness tests: naming contract, config loading, fake-env
end-to-end episodes with the oracle scorer, results readout."""

import math
import os

import numpy as np
import pytest
import yaml

from video_dqn_tpu.eval import (
    display_results,
    get_eval_defaults,
    load_file,
    make_geodesic_scorer,
    name_from_config,
    ours_evaluate,
    run_policy,
)
from video_dqn_tpu.eval.fixtures import FakeHouse, make_env_and_episode
from video_dqn_tpu.plan.mapper import DepthMapperAndPlanner
from video_dqn_tpu.sim.fake_env import FakeNavEnv


def eval_cfg(**over):
    cfg = get_eval_defaults()
    for k, v in over.items():
        cfg[k] = v
    return cfg


def small_planner(env):
    p = DepthMapperAndPlanner(dt=30, map_size_cm=2500, mark_locs=True,
                              close_small_openings=True)
    return p


def test_name_from_config_contract():
    cfg = eval_cfg(SCORE="model", MODEL_NAME="vlv", SLAM=True,
                   BACKTRACK_REJECTION=True, CONSISTENCY_WEIGHT=0.5,
                   COMBINE_DETECTOR=True, CONFIDENCE_THRESHOLD=0.9,
                   SEED=2, STAIRS=True)
    assert name_from_config(cfg) == (
        "vlv_spl_slam_rejection_combined0.9_consistency0.5_seed2_with_stairs"
    )
    assert name_from_config(eval_cfg()) == "geodesic_spl"
    assert name_from_config(eval_cfg(TOTAL_RANDOM=True)) == "total_random"
    assert name_from_config(eval_cfg(MODEL_NUMBER=150000)) == (
        "geodesic_spl_model150000"
    )


def test_load_file_inherit_and_model_config(tmp_path):
    model_dir = tmp_path / "model_exp"
    model_dir.mkdir()
    (model_dir / "config.yml").write_text(
        yaml.safe_dump({"PANORAMA": False, "GAMMA": 0.99})
    )
    base = tmp_path / "base.yml"
    base.write_text(yaml.safe_dump({"SLAM": True, "SEED": 3}))
    child = tmp_path / "child.yml"
    child.write_text(
        yaml.safe_dump(
            {
                "INHERIT": str(base),
                "SCORE": "model",
                "MODEL_CONFIG_LOCATION": str(model_dir),
            }
        )
    )
    cfg = load_file(str(child))
    assert cfg.SLAM is True and cfg.SEED == 3  # inherited
    assert cfg.SCORE == "model"
    assert cfg.MODEL_CONFIG.GAMMA == 0.99
    assert cfg.is_frozen


def test_episode_oracle_scorer_reaches_goal():
    """End-to-end: geodesic-oracle scorer on the fake maze must reach an
    easy same-room goal with positive SPL."""
    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(SLAM=True, SEED=1)
    scorer = make_geodesic_scorer(env)
    spl = ours_evaluate(cfg, env, ep, house, 0, scorer, visualize=False,
                        planner=small_planner(env))
    assert spl > 0, f"episode failed, spl={spl}"


def test_episode_unreachable_goal_returns_zero():
    env, house, ep = make_env_and_episode()
    ep = (*ep[:3], float("inf"), *ep[4:])
    cfg = eval_cfg()
    spl = ours_evaluate(cfg, env, ep, house, 0, make_geodesic_scorer(env),
                        planner=small_planner(env))
    assert spl == 0


def test_stop_mode_returns_log():
    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(STOP=True, SLAM=True, SEED=1)
    out = ours_evaluate(cfg, env, ep, house, 0, make_geodesic_scorer(env),
                        planner=small_planner(env))
    assert isinstance(out, np.ndarray)


def test_run_policy_and_results(tmp_path):
    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(SLAM=True, SEED=1,
                   RESULT_LOCATION=str(tmp_path / "results"))
    episodes = np.array([ep, ep], dtype=object)

    def env_factory(house_obj, model_config, config):
        e, _, _ = make_env_and_episode()
        return e

    def scorer_factory(e, class_index):
        return make_geodesic_scorer(e)

    run_policy(
        cfg,
        episodes=episodes,
        env_factory=env_factory,
        house_factory=lambda name: house,
        scorer_factory=scorer_factory,
        visualize_every=1000,
    )
    mean = display_results(cfg, quiet=True)
    assert mean is not None and mean >= 0


def test_batched_matches_sequential_reasoning_candidates():
    """BATCHED_REASONING merges 12 per-view programs into one; candidate
    waypoints still appear and episodes still complete."""
    for batched in (True, False):
        env, house, ep = make_env_and_episode()
        cfg = eval_cfg(SLAM=True, SEED=1, BATCHED_REASONING=batched)
        spl = ours_evaluate(cfg, env, ep, house, 0, make_geodesic_scorer(env),
                            planner=small_planner(env))
        assert spl >= 0


def test_detector_from_config_construction():
    """COMBINE_DETECTOR builds the detector FROM CONFIG (the reference's
    in-policy predictor construction, evaluate.py:97-100): 'stub' gives the
    deterministic test detector, empty weights fail loudly, and no detector
    mode gives None."""
    from video_dqn_tpu.data.detect import StubDetector
    from video_dqn_tpu.eval import build_detector_from_config

    assert build_detector_from_config(eval_cfg()) is None
    det = build_detector_from_config(
        eval_cfg(COMBINE_DETECTOR=True, DETECTOR_WEIGHTS="stub"))
    assert isinstance(det, StubDetector)
    # the constructed detector honors the eval-fusion call contract
    img = np.zeros((64, 64, 3), np.uint8)
    boxes, scores = det(img, "toilet")
    assert boxes.shape[1:] == (4,) and len(boxes) == len(scores)
    with pytest.raises(ValueError, match="DETECTOR_WEIGHTS"):
        build_detector_from_config(eval_cfg(COMBINE_DETECTOR=True))
    with pytest.raises(ValueError, match="DETECTOR_WEIGHTS"):
        build_detector_from_config(eval_cfg(SCORE="detector"))


def test_fuse_detector_batched_matches_per_image():
    """The batched fusion path (one detector call per 12-view stop via the
    pipeline contract) must be bit-identical to per-view calls through the
    eval contract — same detections, same fusion math."""
    from video_dqn_tpu.data.detect import StubDetector
    from video_dqn_tpu.eval.evaluate import fuse_detector_scores

    det = StubDetector(hit_rate=0.9, seed=3)

    class PerImageOnly:
        """Strips the batch contract: only (im, class_label) works."""

        def __call__(self, images, class_label=None):
            if class_label is None:
                raise TypeError("per-image detector: class_label required")
            return det(images, class_label)

    rng = np.random.default_rng(0)
    rgbs = [rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            for _ in range(12)]
    scores = rng.normal(size=12)
    for cls in ("toilet", "bed"):
        batched = fuse_detector_scores(scores, rgbs, det, cls, 0.5)
        per_image = fuse_detector_scores(
            scores, rgbs, PerImageOnly(), cls, 0.5)
        np.testing.assert_array_equal(batched, per_image)
    # the fusion actually fired somewhere at this hit rate
    assert (batched != scores).any()


def test_fuse_detector_genuine_errors_propagate():
    """A real detector failure (OOM, shape bug, bad weights) must surface,
    not be silently retried down the per-image path (round-3 Weak #2: the
    old blanket `except Exception` masked everything). Only TypeError — the
    signature-mismatch class — may trigger the one-time per-image fallback,
    and the contract verdict is cached so later stops run unguarded."""
    from video_dqn_tpu.eval.evaluate import fuse_detector_scores

    rng = np.random.default_rng(0)
    rgbs = [rng.integers(0, 255, (48, 48, 3), dtype=np.uint8) for _ in range(3)]
    scores = rng.normal(size=3)

    class Exploding:
        def __call__(self, images, class_label=None):
            raise ValueError("bad weights: NaN box regressions")

    with pytest.raises(ValueError, match="bad weights"):
        fuse_detector_scores(scores, rgbs, Exploding(), "bed", 0.5)

    class Malformed:
        """Accepts a batch but returns garbage — must fail loudly, not
        silently degrade to 12x per-image calls."""

        def __call__(self, images, class_label=None):
            return np.zeros(len(images))

    with pytest.raises(TypeError, match="batch contract"):
        fuse_detector_scores(scores, rgbs, Malformed(), "bed", 0.5)

    class CountingPerImage:
        """Per-image contract behind a batch-shaped signature: TypeError on
        the probe (once), then cached — no re-probing on later stops."""

        batch_attempts = 0

        def __call__(self, images, class_label=None):
            if class_label is None:
                type(self).batch_attempts += 1
                raise TypeError("per-image only")
            return np.zeros((0, 4), np.float32), np.zeros(0, np.float32)

    det = CountingPerImage()
    fuse_detector_scores(scores, rgbs, det, "bed", 0.5)
    fuse_detector_scores(scores, rgbs, det, "bed", 0.5)
    assert CountingPerImage.batch_attempts == 1
    assert det._vdqn_batch_contract is False

    class TwoArg:
        """>= 2 required positional args: classified per-image by signature
        alone — the batch probe must never run."""

        def __call__(self, image, class_label):
            assert class_label is not None
            return np.zeros((0, 4), np.float32), np.zeros(0, np.float32)

    out = fuse_detector_scores(scores, rgbs, TwoArg(), "bed", 0.5)
    np.testing.assert_array_equal(out, scores)


def test_run_policy_combine_detector_from_config(tmp_path, monkeypatch):
    """An eval run with COMBINE_DETECTOR: True + DETECTOR_WEIGHTS: 'stub'
    exercises fuse_detector_scores through run_policy with ZERO code
    injection (round-2 gap: the fusion math existed but no product surface
    could construct a detector)."""
    import video_dqn_tpu.eval.evaluate as ev

    calls = []
    real_fuse = ev.fuse_detector_scores

    def counting_fuse(*a, **k):
        calls.append(1)
        return real_fuse(*a, **k)

    monkeypatch.setattr(ev, "fuse_detector_scores", counting_fuse)

    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(SLAM=True, SEED=1, COMBINE_DETECTOR=True,
                   DETECTOR_WEIGHTS="stub", CONFIDENCE_THRESHOLD=0.5,
                   RESULT_LOCATION=str(tmp_path / "results"))
    run_policy(
        cfg,
        episodes=np.array([ep], dtype=object),
        env_factory=lambda h, mc, c: make_env_and_episode()[0],
        house_factory=lambda name: house,
        scorer_factory=lambda e, ci: make_geodesic_scorer(e),
        visualize_every=1000,
    )
    assert calls, "fuse_detector_scores never ran with COMBINE_DETECTOR on"
    assert display_results(cfg, quiet=True) is not None


def test_infinite_fmm_waypoint_skipped():
    """A selected waypoint whose FMM distance is inf (cell disconnected in
    the current map) must be skipped, not crash the step-budget ceil
    (OverflowError observed on long product workloads)."""
    env, house, ep = make_env_and_episode()

    class InfFirstPlanner(DepthMapperAndPlanner):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._inf_budget = 3

        def fmm_distance_m(self, point):
            if self._inf_budget > 0:
                self._inf_budget -= 1
                return float("inf")
            return super().fmm_distance_m(point)

    planner = InfFirstPlanner(dt=30, map_size_cm=2500, mark_locs=True,
                              close_small_openings=True)
    cfg = eval_cfg(SLAM=True, SEED=1)
    scorer = make_geodesic_scorer(env)
    spl = ours_evaluate(cfg, env, ep, house, 0, scorer, visualize=False,
                        planner=planner)
    assert 0.0 <= spl <= 1.0  # completed without OverflowError
