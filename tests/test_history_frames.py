"""PREVIOUS_IMAGES history stacking: 4 frames clamped at im_start
(reference dataloaders/q_learning_real.py:57-69)."""

import numpy as np

from video_dqn_tpu.data.qlearning import QLearningBatcher
from video_dqn_tpu.data.synthetic import make_synthetic_dataset


def test_previous_images_stack_and_clamp(tmp_path):
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=1,
                                     frames_per_video=12, image_size=48)
    b = QLearningBatcher(feather, one_action=True, previous_images=True,
                         image_size=48, seed=0)
    assert b.num_frames == 4
    batch = b.get_batch(indices=np.array([0, len(b) - 1]))
    assert batch["before"].shape == (2, 4, 48, 48, 3)

    # row 0: before frame is im_start -> all 4 history frames clamp to it
    first = batch["before"][0]
    for i in range(1, 4):
        np.testing.assert_array_equal(first[i], first[0])

    # last row: before frame is im_start+8 -> frames are distinct
    last = batch["before"][1]
    assert not np.array_equal(last[0], last[1])


def test_history_paths_respect_zero_padding(tmp_path):
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=1,
                                     frames_per_video=8, image_size=48)
    b = QLearningBatcher(feather, one_action=True, previous_images=True,
                         image_size=48)
    paths = b._history_paths(b.cols["before_image"][3], b.cols["im_start"][3])
    assert len(paths) == 4
    assert all(p.endswith(".jpg") for p in paths)
    # descending ids clamped at start
    ids = [int(p[-8:-4]) for p in paths]
    assert ids == sorted(ids, reverse=True) or len(set(ids)) < 4


def test_confidence_reward_terminal_is_reward(tmp_path):
    """In confidence mode the reference returns the raw detector scores in
    BOTH the reward and terminal slots — its computed terminal locals are
    discarded (/root/reference/dataloaders/q_learning_real.py:76-98) — so
    Q_a is attenuated by (1 - confidence). ADVICE round-1 regression."""
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=1,
                                     frames_per_video=12, image_size=48)
    b = QLearningBatcher(feather, one_action=True, confidence_reward=True,
                         image_size=48, seed=0)
    np.testing.assert_array_equal(b.terminal, b.reward)
    assert b.reward.dtype == np.float32
    # confidence scores are the raw (unthresholded) detector outputs
    assert ((b.reward > 0) & (b.reward < 1)).any()

    bb = QLearningBatcher(feather, one_action=True, confidence_reward=False,
                          image_size=48, seed=0)
    np.testing.assert_array_equal(bb.terminal, bb.reward)
    assert set(np.unique(bb.reward)) <= {0.0, 1.0}
