"""Simulator-generated dataset: standard schema, true action labels,
proximity rewards — the self-contained data path (data/sim_dataset.py)."""

import numpy as np
import pytest

from video_dqn_tpu.data.qlearning import QLearningBatcher
from video_dqn_tpu.data.schema import validate_schema, read_feather
from video_dqn_tpu.data.sim_dataset import generate_sim_dataset
from video_dqn_tpu.eval.fixtures import make_furnished_house
from video_dqn_tpu.sim.native_mesh import available

pytestmark = pytest.mark.skipif(not available(), reason="libsimcore missing")


@pytest.fixture(scope="module")
def sim_ds(tmp_path_factory):
    env, house = make_furnished_house(size_px=32, seed=0)
    root = tmp_path_factory.mktemp("simds")
    feather = generate_sim_dataset(
        env, house, str(root), n_videos=2, steps_per_video=60,
        reward_dist=2.0, seed=0,
    )
    return feather, env, house


def test_schema_and_actions(sim_ds):
    feather, env, house = sim_ds
    df = read_feather(feather)
    validate_schema(df)
    assert "inverse_actions" in df.columns
    assert set(np.unique(df["inverse_actions"])) <= {0, 1, 2}
    assert len(df) > 50
    # quadruplet stride: after = before + 3
    b = int(df.iloc[0]["before_image"][-8:-4])
    a = int(df.iloc[0]["after_image"][-8:-4])
    assert a - b == 3


def test_rewards_track_proximity(sim_ds):
    """Rows with a sparse reward must actually be near the class object."""
    feather, env, house = sim_ds
    df = read_feather(feather)
    sparse = np.stack([df[f"sparse_reward{k}"] for k in range(5)], axis=1)
    steps = np.stack([df[f"steps_to_reward{k}"] for k in range(5)], axis=1)
    # wherever a reward exists, steps_to_reward is 0 at that row/class
    assert (steps[sparse > 0] == 0).all()
    # and somewhere there IS reward signal to learn from
    assert sparse.sum() > 0
    assert np.isfinite(steps).any()


def test_batcher_loads_with_value_learning_and_cache(sim_ds):
    feather, _, _ = sim_ds
    b = QLearningBatcher(feather, one_action=True, value_learning=True,
                         image_size=32, cache_images=True, gamma=0.9)
    batch = b.get_batch(batch_size=8)
    assert batch["before"].shape == (8, 1, 32, 32, 3)
    # gt is gamma^steps with NaN at inf
    finite = np.isfinite(b.gt)
    assert finite.any()
    assert (b.gt[finite] <= 1.0).all() and (b.gt[finite] > 0).all()
    # cache actually populated and reused
    n_cached = len(b._image_cache)
    assert n_cached > 0
    b.get_batch(indices=np.arange(8))
    b.get_batch(indices=np.arange(8))
    assert len(b._image_cache) >= n_cached


def test_generate_inverse_pairs_roundtrip(tmp_path):
    """generate_inverse_pairs emits the exact 22-column npy + state-image
    layout GibsonPairBatcher consumes (the inverse-model training data the
    reference ships only as opaque artifacts,
    /root/reference/train_inverse_model.py:183-185)."""
    from video_dqn_tpu.data.gibson_pairs import GibsonPairBatcher
    from video_dqn_tpu.data.sim_dataset import generate_inverse_pairs

    env, _ = make_furnished_house(size_px=24, seed=0)
    train_p, val_p, image_root = generate_inverse_pairs(
        env, str(tmp_path), n_walks=2, steps_per_walk=25, seed=0,
    )
    arr = np.load(train_p, allow_pickle=True)
    assert arr.shape[1] == 22
    b = GibsonPairBatcher(train_p, image_root=image_root, image_size=24)
    assert len(b) > 20
    assert set(np.unique(b.action)) <= {0, 1, 2}
    # turns AND forwards present (forward-biased walk)
    assert (b.action == 0).sum() > 0 and (b.action > 0).sum() > 0
    batch = b.get_batch(batch_size=6)
    assert batch["before"].shape == (6, 1, 24, 24, 3)
    assert batch["after"].shape == (6, 1, 24, 24, 3)
    # no reward rows by construction (min_dists are +inf)
    assert batch["reward"].sum() == 0
    # turn pairs: before != after pixels (the signal the model learns)
    turn = np.flatnonzero(b.action > 0)[:1]
    tb = b.get_batch(indices=turn)
    assert (tb["before"] != tb["after"]).any()
