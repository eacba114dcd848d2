"""Inverse-action training tests: Gibson pair batcher semantics + a
CE-training smoke over the 8-device mesh."""

import os

import numpy as np
import pytest

import jax

from video_dqn_tpu.data.gibson_pairs import GibsonPairBatcher, split_columns


def make_pairs_npy(tmp_path, n=24, panorama=False, seed=0):
    """Synthetic 22-column object npy + state image folders."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    root = tmp_path / "states"
    rows = []
    for i in range(n):
        for which in ("b", "a"):
            loc = f"s{i}{which}"
            d = root / loc
            d.mkdir(parents=True, exist_ok=True)
            for o in range(4 if panorama else 1):
                Image.fromarray(
                    rng.integers(0, 255, (64, 64, 3), np.uint8)
                ).save(d / f"{o}.jpg")
        rows.append(
            [f"s{i}b", *rng.uniform(-5, 5, 3), *rng.uniform(-1, 1, 4),
             f"s{i}a", *rng.uniform(-5, 5, 3), *rng.uniform(-1, 1, 4),
             rng.integers(1, 4), *rng.uniform(0, 5, 5)]
        )
    arr = np.array(rows, dtype=object)
    path = tmp_path / "pairs.npy"
    np.save(path, arr)
    return str(path), str(root)


def test_split_columns_errors():
    with pytest.raises(ValueError):
        split_columns(np.zeros((3, 10)), [4, 4])


def test_gibson_pair_batcher_labels(tmp_path):
    path, root = make_pairs_npy(tmp_path, n=12)
    b = GibsonPairBatcher(path, class_label="toilet", image_root=root,
                          image_size=64, reward_dist=1.0)
    assert len(b) == 12
    batch = b.get_batch(batch_size=6)
    assert batch["before"].shape == (6, 1, 64, 64, 3)
    assert set(np.unique(batch["action"])) <= {0, 1, 2}  # action-1
    assert batch["reward"].shape == (6, 1)
    # gt = gamma^dist consistent with reward threshold
    assert ((batch["gt"] >= 0) & (batch["gt"] <= 1)).all()


def test_gibson_pair_batcher_all_classes(tmp_path):
    path, root = make_pairs_npy(tmp_path, n=8)
    b = GibsonPairBatcher(path, class_label="all", image_root=root, image_size=64)
    batch = b.get_batch(batch_size=4)
    assert batch["reward"].shape == (4, 5)


def test_gibson_pair_known_filter(tmp_path):
    path, root = make_pairs_npy(tmp_path, n=20)
    b_all = GibsonPairBatcher(path, class_label="toilet", image_root=root)
    b_known = GibsonPairBatcher(path, class_label="toilet", image_root=root,
                                known=True, reward_dist=1.0)
    assert len(b_known) <= len(b_all)


def test_inverse_training_smoke(tmp_path, mesh8):
    import jax.numpy as jnp

    from video_dqn_tpu.train.inverse import run_inverse_train

    path, root = make_pairs_npy(tmp_path, n=16)
    # the inverse head needs a trunk map >= 5x5 -> images >= 160 px
    train_b = GibsonPairBatcher(path, class_label="toilet", image_root=root,
                                image_size=160)
    model, state = run_inverse_train(
        train_b, train_b, out_dir=str(tmp_path / "out"), batch_size=8,
        num_steps=2, validate_every=2, val_batches=1, mesh=mesh8,
        image_size=160, dtype=jnp.float32,
    )
    assert int(jax.device_get(state.step)) == 2
    from video_dqn_tpu.core import latest_checkpoint_step

    assert latest_checkpoint_step(str(tmp_path / "out")) == 2


def test_val_episodes_table_loads():
    """The vendored 1,075-episode validation table must load without the
    numpy-quaternion dependency and follow the (house, floor, class,
    goal_dist, pos, quat) row contract."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    eps = np.load(os.path.join(here, "evaluation/val_episodes.npy"),
                  allow_pickle=True)
    assert eps.shape == (1075, 6)
    houses = {row[0] for row in eps}
    assert houses == {"Collierville", "Corozal", "Darden", "Markleeville",
                      "Wiconisco"}
    hn, floor, cls, gd, pos, rot = eps[0]
    assert pos.shape == (3,) and rot.shape == (4,)
    assert cls in {"bed", "chair", "couch", "dining table", "toilet"}


def test_inverse_backbone_graft(tmp_path):
    """backbone_weights initializes the FROZEN trunk (params + BN stats)
    from a torchvision state dict — without it the stop_gradient trunk
    would stay at random init forever (reference inverse_action2.py:50
    builds from resnet18(pretrained=True))."""
    import torch

    from tests.torch_ref import TorchResNet18
    from video_dqn_tpu.train.inverse import create_inverse_state

    torch.manual_seed(11)
    tref = TorchResNet18()
    with torch.no_grad():
        tref(torch.randn(2, 3, 64, 64))
    path = str(tmp_path / "resnet18.pth")
    torch.save(tref.state_dict(), path)

    _, state, _ = create_inverse_state(image_size=224, backbone_weights=path)
    sd = tref.state_dict()
    np.testing.assert_allclose(
        np.asarray(state.params["resnet"]["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["resnet"]["layer2_0"]["bn1"]["mean"]),
        sd["layer2.0.bn1.running_mean"].numpy(), rtol=1e-5)
    # head layers stay randomly initialized
    assert "fc_accuracy" in state.params
