"""Extra eval coverage: model-scorer episodes (with fused off-resolution
resize), runner resume, torn result shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_dqn_tpu.core import DiskLogger, DiskReader
from video_dqn_tpu.eval import make_model_scorer, ours_evaluate, run_policy
from video_dqn_tpu.eval.fixtures import FakeHouse, make_env_and_episode
from video_dqn_tpu.models.qnet import HabitatDQN
from video_dqn_tpu.plan.mapper import DepthMapperAndPlanner
from tests.test_eval import eval_cfg, small_planner


def test_model_scorer_resizes_views():
    """Views rendered at 64px go through the fused resize into a 96px
    model — the whole scorer is one jitted call."""
    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 96, 96, 3)), False)
    scorer = make_model_scorer(model, variables["params"],
                               variables.get("batch_stats", {}), 4,
                               image_size=96)
    views = np.random.default_rng(0).integers(0, 256, (12, 64, 64, 3), np.uint8)
    scores = scorer(views)
    assert scores.shape == (12,)
    assert np.isfinite(scores).all()


def test_episode_with_model_scorer():
    env, house, ep = make_env_and_episode(size=64)
    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 64, 64, 3)), False)
    scorer = make_model_scorer(model, variables["params"],
                               variables.get("batch_stats", {}),
                               class_index=4, image_size=64)
    cfg = eval_cfg(SLAM=True, SEED=1, SCORE="model")
    spl = ours_evaluate(cfg, env, ep, house, 0, scorer,
                        planner=small_planner(env))
    assert 0 <= spl <= 1  # random net may or may not find the goal


def test_runner_resume_skips_done(tmp_path):
    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    episodes = np.array([ep, ep, ep], dtype=object)
    calls = {"n": 0}

    def env_factory(h, mc, c):
        e, _, _ = make_env_and_episode()
        return e

    def scorer_factory(e, ci):
        calls["n"] += 1
        from video_dqn_tpu.eval import make_geodesic_scorer

        return make_geodesic_scorer(e)

    run_policy(cfg, episodes=episodes[:2], env_factory=env_factory,
               house_factory=lambda n: house, scorer_factory=scorer_factory,
               visualize_every=1000)
    assert calls["n"] == 2
    # resume over all 3: only the missing episode runs
    run_policy(cfg, episodes=episodes, env_factory=env_factory,
               house_factory=lambda n: house, scorer_factory=scorer_factory,
               visualize_every=1000, resume=True)
    assert calls["n"] == 3
    from video_dqn_tpu.eval import display_results

    assert len(DiskReader(str(tmp_path / "r") + "/geodesic_spl_slam_seed1").data()) == 3


def test_load_eval_model_from_framework_ckpt(tmp_path):
    """The eval runner must load weights from this framework's sample<N>
    checkpoints (the seam between training and eval)."""
    import optax

    from video_dqn_tpu.core import get_cfg_defaults, save_checkpoint
    from video_dqn_tpu.eval.runner import load_eval_model
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.train.dqn import TrainState

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "basic"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.folder = str(tmp_path)

    model = build_qnet(cfg)
    params, stats = init_qnet(model, jax.random.key(7), image_size=64)
    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.asarray(42), params=params, batch_stats=stats,
        target_params=params, target_batch_stats=stats,
        opt_state=tx.init(params), ema_loss=jnp.asarray(0.0),
    )
    save_checkpoint(str(tmp_path / "models"), 42, state)

    eval_cfg_ = eval_cfg(MODEL_NUMBER=42, PRETRAINED_MODEL_LOCATION="")
    m2, p2, s2 = load_eval_model(eval_cfg_, cfg)
    w_saved = np.asarray(params["top_dense1"]["kernel"])
    w_loaded = np.asarray(p2["top_dense1"]["kernel"])
    np.testing.assert_array_equal(w_loaded, w_saved)


def test_load_eval_model_from_torch_checkpoint(tmp_path):
    """...and from the reference's .torch snapshots via the converter."""
    import torch

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.eval.runner import load_eval_model
    from tests.torch_ref import TorchHabitatDQN
    from tests.test_models import randomize

    tm = randomize(TorchHabitatDQN(3, extra_capacity=False, panorama=False).finish(96))
    loc = str(tmp_path / "vlv_model.torch")
    torch.save({"model_state_dict": tm.state_dict()}, loc)

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "basic"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    e = eval_cfg(PRETRAINED_MODEL_LOCATION=loc)
    model, params, stats = load_eval_model(e, cfg)
    want = tm.state_dict()["top.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(params["top_dense1"]["kernel"]), want)


def test_disk_reader_skips_torn_shard(tmp_path):
    folder = str(tmp_path / "res")
    log = DiskLogger(folder)
    log.write(0, 0.5)
    # a crash mid-write leaves a torn file: must be skipped, not fatal
    with open(f"{folder}/deadbeef_123.npy", "wb") as f:
        f.write(b"\x93NUMPY garbage")
    data = DiskReader(folder).data()
    assert data == {0: 0.5}


def test_furnished_workload_backend(tmp_path):
    """make_episode_set(backend='furnished'): episodes carry real
    (floor, class) pairs with goals at the house's own objects, and the
    full harness scores them — the in-distribution workload surface for
    model-scored runs (evaluation/run.py --workload N --furnished-env)."""
    import numpy as np

    from video_dqn_tpu.eval import display_results, run_policy
    from video_dqn_tpu.eval.fixtures import make_episode_set
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.sim.native_mesh import available

    if not available():
        import pytest

        pytest.skip("libsimcore missing")

    episodes, env_factory, house_factory = make_episode_set(
        3, backend="furnished", size=32, seed=5)
    assert len(episodes) == 3
    assert all(ep[0] == "FurnishedHouse" for ep in episodes)
    assert {ep[1] for ep in episodes} <= {0, 1}
    assert all(np.isfinite(float(ep[3])) and float(ep[3]) > 1.5
               for ep in episodes)

    cfg = get_eval_defaults()
    cfg.SLAM = True
    cfg.SEED = 1
    cfg.RESULT_LOCATION = str(tmp_path / "results")
    run_policy(cfg, episodes=episodes[:1], env_factory=env_factory,
               house_factory=house_factory,
               scorer_factory=lambda e, ci: __import__(
                   "video_dqn_tpu.eval.evaluate", fromlist=["x"]
               ).make_geodesic_scorer(e),
               visualize_every=1000)
    mean = display_results(cfg, quiet=True)
    assert mean is not None and 0 <= mean <= 1
