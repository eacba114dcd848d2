"""Double-DQN train-step tests: loss-math oracles, target-sync timing,
checkpoint/resume, and a multichip-sharded end-to-end smoke on the
virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from video_dqn_tpu.core import ExperimentConfig, get_cfg_defaults, latest_checkpoint_step
from video_dqn_tpu.data.synthetic import make_synthetic_dataset, synthetic_batch
from video_dqn_tpu.models.qnet import HabitatDQN
from video_dqn_tpu.train.dqn import (
    create_train_state,
    jit_train_step,
    make_loss_fn,
    make_train_step,
    run_train,
)


def tiny_config(**over):
    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    # extra_capacity (the published arch) keeps backbone BN in eval mode,
    # which makes the loss math deterministic and oracle-comparable.
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.merge_from_dict(over.pop("nested", {}))
    for k, v in over.items():
        parts = k.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def small_batch(b=4, size=96, seed=0):
    return {
        k: jnp.asarray(v) for k, v in synthetic_batch(b, 1, size, seed=seed).items()
    }


def make_small(cfg, size=96):
    """create_train_state but with small init images for CPU speed."""
    import optax
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.train.dqn import TrainState

    model = build_qnet(cfg)
    params, batch_stats = init_qnet(model, jax.random.key(0), image_size=size)
    tx = optax.adam(cfg.LEARNING_RATE)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params),
        ema_loss=jnp.zeros((), jnp.float32),
    )
    return model, state, tx


def oracle_loss(model, state, batch, *, gamma, linear=False, rect=False,
                remove_before=False):
    """Numpy oracle of the reference loss math
    (train_q_network.py:126-181), using the model only as a black-box Q."""
    from video_dqn_tpu.ops.image import normalize_imagenet

    prep = lambda im: normalize_imagenet(jnp.asarray(im).astype(jnp.float32) / 255.0)
    v = {"params": state.params, "batch_stats": state.batch_stats}
    tv = {"params": state.target_params, "batch_stats": state.target_batch_stats}
    q_b_all = np.asarray(model.apply(v, prep(batch["before"]), False))
    q_a_online = np.asarray(model.apply(v, prep(batch["after"]), False))
    q_a_target = np.asarray(model.apply(tv, prep(batch["after"]), False))
    act = np.asarray(batch["action"])
    B, C, A = q_b_all.shape
    q_b = q_b_all[np.arange(B)[:, None], np.arange(C)[None, :], act[:, None]]
    best = q_a_online.argmax(-1)
    q_a = q_a_target[np.arange(B)[:, None], np.arange(C)[None, :], best]
    q_a = q_a * (1 - np.asarray(batch["terminal"]))
    if linear:
        targets = np.asarray(batch["reward"]) + (q_a - 0.1)
    else:
        targets = np.asarray(batch["reward"]) + gamma * q_a
    if rect:
        targets = np.clip(targets, 0, 1)
    losses = 0.5 * (q_b - targets) ** 2
    if remove_before:
        losses = losses * np.asarray(batch["valid_mask"])
    return losses.mean()


@pytest.mark.parametrize("variant", ["plain", "rect", "linear", "remove_before"])
def test_loss_matches_reference_math(variant):
    cfg = tiny_config(
        **{
            "LOSS_CLIP": "rect" if variant == "rect" else "none",
            "LINEAR": variant == "linear",
            "REMOVE_BEFORE_REWARD": variant == "remove_before",
            "GAMMA": 0.9,
        }
    )
    model, state, _ = make_small(cfg)
    batch = small_batch()
    if variant == "remove_before":
        batch = dict(batch)
        batch["valid_mask"] = (jnp.arange(20).reshape(4, 5) % 2).astype(jnp.float32)
    loss_fn = make_loss_fn(model, cfg)
    got, _ = loss_fn(state.params, state.target_params, state.batch_stats,
                     state.target_batch_stats, batch)
    want = oracle_loss(
        model, state, batch, gamma=0.9,
        linear=(variant == "linear"), rect=(variant == "rect"),
        remove_before=(variant == "remove_before"),
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_gt_value_learning_nan_mask():
    cfg = tiny_config(TRAIN_ON_GROUND_TRUTH=True, VALUE_LEARNING=True)
    model, state, _ = make_small(cfg)
    batch = small_batch()
    batch = dict(batch)
    # VALUE_LEARNING collapses to a single-action head; labels are 0
    # (reference uses one_action in this mode, train_q_network.py:38-41,99)
    batch["action"] = jnp.zeros_like(batch["action"])
    gt = np.asarray(batch["gt"]).copy()
    gt[0, :] = np.nan  # no-reward samples must be masked, not NaN the loss
    batch["gt"] = jnp.asarray(gt)
    loss_fn = make_loss_fn(model, cfg)
    got, _ = loss_fn(state.params, state.target_params, state.batch_stats,
                     state.target_batch_stats, batch)
    assert np.isfinite(float(got))
    from video_dqn_tpu.ops.image import normalize_imagenet
    q = np.asarray(
        model.apply({"params": state.params, "batch_stats": state.batch_stats},
                    normalize_imagenet(jnp.asarray(batch["before"]).astype(jnp.float32) / 255.0),
                    False)
    )
    act = np.asarray(batch["action"])
    B, C, A = q.shape
    q_b = q[np.arange(B)[:, None], np.arange(C)[None, :], act[:, None]]
    mask = ~np.isnan(gt)
    want = (0.5 * (q_b * mask - np.nan_to_num(gt)) ** 2).mean()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_target_sync_interval():
    cfg = tiny_config(TARGET_UPDATE_INTERVAL=2)
    model, state, tx = make_small(cfg)
    step_fn = jax.jit(make_train_step(model, cfg, tx))
    b1 = small_batch(seed=1)
    # step 1: no sync — target stays at init while params move
    state, _ = step_fn(state, b1)
    p = jax.device_get(state.params["top_dense1"]["kernel"])
    t = jax.device_get(state.target_params["top_dense1"]["kernel"])
    assert not np.allclose(p, t)
    # step 2: sync happens BEFORE the update -> target == params at step 1
    p_before = jax.device_get(state.params["top_dense1"]["kernel"])
    state, _ = step_fn(state, small_batch(seed=2))
    t2 = jax.device_get(state.target_params["top_dense1"]["kernel"])
    np.testing.assert_allclose(t2, p_before, atol=1e-7)


def test_train_smoke_end_to_end(tmp_path, mesh8):
    """Minimum end-to-end slice (SURVEY.md section 7 stage 3): synthetic
    feather -> sharded jitted training -> checkpoint -> resume."""
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=2,
                                     frames_per_video=16, image_size=64)
    folder = tmp_path / "exp"
    folder.mkdir()
    (folder / "config.yml").write_text(
        yaml.safe_dump(
            {
                "DATASET": feather,
                "PANORAMA": False,
                "ARCHITECTURE": "basic",
                "USE_INVERSE_ACTIONS": True,
                "CHECKPOINT_INTERVAL": 3,
                "NUM_STEPS": 6,
                "TARGET_UPDATE_INTERVAL": 4,
                # STALL_TIMEOUT_S arms the training stall watchdog for
                # the whole run (wiring coverage: normal completion must
                # beat, then stop it — a leak would os._exit this process)
                "TPU": {"BATCH_SIZE": 8, "COMPUTE_DTYPE": "float32",
                        "STALL_TIMEOUT_S": 60},
            }
        )
    )
    config = ExperimentConfig(str(folder), tensorboard=False)
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    batcher = QLearningBatcher(feather, one_action=True, inverse_actions=True,
                               image_size=64, seed=0)
    state, _ = run_train(config, batcher=batcher, mesh=mesh8, log_every=2)
    assert int(jax.device_get(state.step)) == 6
    assert latest_checkpoint_step(config.models_dir) == 6
    assert np.isfinite(float(jax.device_get(state.ema_loss)))

    # resume from 3 and retrain to 6
    config2 = ExperimentConfig(str(folder), resume=True, tensorboard=False)
    state2, _ = run_train(config2, resume_from=3, batcher=batcher, mesh=mesh8,
                          log_every=2)
    assert int(jax.device_get(state2.step)) == 6


def test_bootstrap_semantics(tmp_path, mesh8):
    """BOOTSTRAP loads donor weights but starts the loop counter fresh and
    re-syncs the target net to the loaded model (reference
    train_q_network.py:200-208,190: sample_number stays resume_from+1 and
    target_net.load_state_dict(model.state_dict()) runs after the load)."""
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=2,
                                     frames_per_video=16, image_size=64)
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    batcher = QLearningBatcher(feather, one_action=True, inverse_actions=True,
                               image_size=64, seed=0)

    donor = tmp_path / "donor"
    donor.mkdir()
    donor_cfg = {
        "DATASET": feather,
        "PANORAMA": False,
        "ARCHITECTURE": "basic",
        "USE_INVERSE_ACTIONS": True,
        "CHECKPOINT_INTERVAL": 2,
        "NUM_STEPS": 2,
        "TARGET_UPDATE_INTERVAL": 4,
        "TPU": {"BATCH_SIZE": 8, "COMPUTE_DTYPE": "float32"},
    }
    (donor / "config.yml").write_text(yaml.safe_dump(donor_cfg))
    config = ExperimentConfig(str(donor), tensorboard=False)
    donor_state, _ = run_train(config, batcher=batcher, mesh=mesh8,
                               log_every=2)
    donor_params = jax.device_get(donor_state.params)

    boot = tmp_path / "boot"
    boot.mkdir()
    boot_cfg = dict(donor_cfg, BOOTSTRAP=True,
                    BOOTSTRAP_LOCATION=str(config.models_dir))
    (boot / "config.yml").write_text(yaml.safe_dump(boot_cfg))
    config2 = ExperimentConfig(str(boot), tensorboard=False)
    # max_steps=0: observe the exact post-bootstrap state
    state, _ = run_train(config2, batcher=batcher, mesh=mesh8,
                         max_steps=0, log_every=2)
    assert int(jax.device_get(state.step)) == 0  # fresh counter
    host = jax.device_get(state)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           host.params, donor_params)
    # target re-synced to the loaded model, not the donor's target
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           host.target_params, host.params)


def test_batchnorm_mode_semantics():
    """extra_capacity freezes backbone BN during training (reference
    set_train, HabitatDQNMultiAction.py:37-40); basic trains it."""
    import optax

    for arch, should_change in [("extra_capacity", False), ("basic", True)]:
        cfg = tiny_config(ARCHITECTURE=arch)
        model, state, tx = make_small(cfg, size=96)
        step_fn = jax.jit(make_train_step(model, cfg, tx))
        before_stats = jax.device_get(state.batch_stats)
        state2, _ = step_fn(state, small_batch(b=2, size=96))
        after_stats = jax.device_get(state2.batch_stats)
        leaves_b = jax.tree_util.tree_leaves(before_stats)
        leaves_a = jax.tree_util.tree_leaves(after_stats)
        changed = any(
            not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b)
        )
        assert changed == should_change, arch


def test_multichip_sharding_applied(mesh8):
    cfg = tiny_config(**{"TPU.MESH_MODEL": 2})
    model, state, tx = make_small(cfg)
    step_fn, sharded, shardings = jit_train_step(model, cfg, tx, mesh8, state)
    k = sharded.params["top_dense1"]["kernel"]
    # Q-head kernels shard over the model axis
    assert "model" in str(k.sharding.spec)
    state2, metrics = step_fn(sharded, small_batch(b=8))
    assert np.isfinite(float(metrics["loss"]))
    k2 = state2.params["top_dense1"]["kernel"]
    assert k2.sharding.spec == k.sharding.spec


def _run_steps_on_mesh(mesh, cfg, batches):
    """Fresh identical init (key(0)), jit on `mesh`, run len(batches) steps;
    returns (per-step losses, final host state)."""
    model, state, tx = make_small(cfg)
    step_fn, state, _ = jit_train_step(model, cfg, tx, mesh, state)
    from video_dqn_tpu.parallel import shard_batch

    losses = []
    for b in batches:
        state, metrics = step_fn(state, shard_batch(mesh, b))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, jax.device_get(state)


def test_sharded_step_matches_single_device(mesh8):
    """Numerical-equivalence certificate for the sharded train step
    (round-3 Weak #1): N steps spanning a target-sync boundary on the
    single-device mesh, 8x1 (pure dp), and 4x2 (dp+tp) meshes from
    identical state and batches must produce the same per-step losses and
    the same updated params/targets/opt state — the sharding may only
    change WHERE the math runs, never the answer (up to float reduction
    order in the psum)."""
    from video_dqn_tpu.parallel import make_mesh

    cfg = tiny_config(
        LOSS_CLIP="rect", GAMMA=0.99, TARGET_UPDATE_INTERVAL=2,
        **{"TPU.MESH_MODEL": 2},
    )
    batches = [small_batch(b=8, seed=i) for i in range(3)]

    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    mesh_dp = make_mesh(8, 1)
    losses1, final1 = _run_steps_on_mesh(mesh1, cfg, batches)
    losses_dp, final_dp = _run_steps_on_mesh(mesh_dp, cfg, batches)
    losses_tp, final_tp = _run_steps_on_mesh(mesh8, cfg, batches)

    # step 2 crossed the sync boundary: targets must have been refreshed
    tk1 = final1.target_params["top_dense1"]["kernel"]
    assert not np.allclose(
        tk1, jax.device_get(make_small(cfg)[1].target_params["top_dense1"]["kernel"])
    ), "test never crossed a target-sync boundary"

    # Tolerances: the data-sharded gradient mean is a psum of per-shard
    # partial sums, so float32 reduction order differs from the single
    # device's flat sum — observed |dloss| ~2e-5 on a loss of 5.3 here.
    # Params are compared as the relative L2 of the UPDATE (final - init):
    # element-wise comparison after Adam is meaningless for near-zero-
    # gradient elements (reduction noise flips the gradient sign and Adam's
    # m/sqrt(nu) normalization turns that into a full +/-lr step — measured
    # 94/294912 elements at 2e-3); the update-norm metric reads ~2% under
    # that noise while a genuine sharding bug (stale shard, wrong batch
    # slice, missed sync) reads ~70-100%.
    init = jax.device_get(make_small(cfg)[1])
    for name, losses, final in [("8x1", losses_dp, final_dp),
                                ("4x2", losses_tp, final_tp)]:
        np.testing.assert_allclose(losses, losses1, rtol=1e-4, atol=5e-5,
                                   err_msg=f"per-step losses diverge on {name}")
        for field in ("params", "target_params"):
            deltas1, deltas = [], []
            for la, lb, li in zip(
                jax.tree_util.tree_leaves(getattr(final1, field)),
                jax.tree_util.tree_leaves(getattr(final, field)),
                jax.tree_util.tree_leaves(getattr(init, field)),
            ):
                da = np.asarray(la, np.float64) - np.asarray(li, np.float64)
                db = np.asarray(lb, np.float64) - np.asarray(li, np.float64)
                deltas1.append(da.ravel())
                deltas.append(db.ravel())
                denom = np.linalg.norm(da)
                if denom < 1e-10:  # leaf the optimizer never moved
                    assert np.linalg.norm(db) < 1e-7, (name, field)
                else:
                    # per-leaf bound: measured noise peaks at 6.7% on
                    # frozen-BN trunk biases (near-zero grads)
                    rel = np.linalg.norm(db - da) / denom
                    assert rel < 0.25, (name, field, rel)
            # whole-tree bound: measured noise 2.0%; a stale shard or
            # wrong batch slice reads 70-100%
            a = np.concatenate(deltas1)
            b = np.concatenate(deltas)
            rel = np.linalg.norm(b - a) / np.linalg.norm(a)
            assert rel < 0.05, (name, field, rel)
        # frozen-BN arch: stats must be bit-identical to init on every mesh
        for lb, li in zip(jax.tree_util.tree_leaves(final.batch_stats),
                          jax.tree_util.tree_leaves(init.batch_stats)):
            np.testing.assert_array_equal(lb, li)
        np.testing.assert_allclose(final.ema_loss, final1.ema_loss,
                                   rtol=1e-4, atol=5e-5)
        assert int(final.step) == int(final1.step) == 3


def test_backbone_weights_graft(tmp_path):
    """BACKBONE_WEIGHTS initializes the backbone params AND batch_stats from
    a torchvision-format state dict (ADVICE round 1: the reference always
    builds from resnet18(pretrained=True), and extra_capacity freezes the
    BN statistics, so a random-stats init is a permanent divergence)."""
    import torch

    from tests.torch_ref import TorchResNet18

    torch.manual_seed(7)
    tref = TorchResNet18()
    # make running stats distinguishable from the (0, 1) init
    with torch.no_grad():
        tref(torch.randn(2, 3, 64, 64))
        tref(torch.randn(2, 3, 64, 64))
    path = str(tmp_path / "resnet18.pth")
    torch.save(tref.state_dict(), path)

    cfg = tiny_config()
    cfg.BACKBONE_WEIGHTS = path
    _, state, _ = create_train_state(cfg, jax.random.key(0))

    sd = tref.state_dict()
    np.testing.assert_allclose(
        np.asarray(state.params["resnet"]["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["resnet"]["layer4_1"]["bn2"]["var"]),
        sd["layer4.1.bn2.running_var"].numpy(),
        rtol=1e-5,
    )
    # target net starts as a copy of the grafted params
    np.testing.assert_array_equal(
        np.asarray(state.target_params["resnet"]["conv1"]["kernel"]),
        np.asarray(state.params["resnet"]["conv1"]["kernel"]),
    )
    # head stays randomly initialized (not present in the backbone sd)
    assert "top_dense1" in state.params
