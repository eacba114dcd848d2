"""HBM-resident dataset (data/device_dataset.py): device-side sampling
must reproduce the host batcher's batches exactly, and the train CLI path
must run on it end-to-end (TPU.DEVICE_DATASET)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_dqn_tpu.data.device_dataset import DeviceDataset
from video_dqn_tpu.data.qlearning import QLearningBatcher
from video_dqn_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def feather(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dds"))
    return make_synthetic_dataset(root, num_videos=3, frames_per_video=24,
                                  image_size=64)


def _host_rows(dds, step):
    """Recompute the sampler's row draw on host (threefry is
    backend-invariant, so this is bit-identical to the on-device draw)."""
    base = jax.random.wrap_key_data(dds._base_key)
    if dds.sampling == "epoch":
        spe = dds.n // dds.batch_size
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(base, step // spe), dds.n))
        j = step % spe
        return perm[j * dds.batch_size : (j + 1) * dds.batch_size]
    key = jax.random.fold_in(base, jnp.asarray(step, jnp.int32))
    return np.asarray(jax.random.randint(key, (dds.batch_size,), 0, dds.n))


@pytest.mark.parametrize("previous_images", [False, True])
@pytest.mark.parametrize("sampling", ["epoch", "uniform"])
def test_device_batch_matches_host_batcher(feather, previous_images,
                                           sampling):
    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True,
                               previous_images=previous_images,
                               image_size=64, seed=3)
    dds = DeviceDataset(batcher, batch_size=8, seed=3, sampling=sampling)
    for step in (0, 1, 17):
        dev = jax.device_get(dds.sample(step))
        host = batcher.get_batch(_host_rows(dds, step))
        assert set(dev) == set(host)
        for k in host:
            np.testing.assert_array_equal(
                dev[k], host[k], err_msg=f"{k} step {step} "
                f"previous_images={previous_images}")


def test_epoch_sampling_covers_each_row_once(feather):
    """'epoch' mode is shuffle-without-replacement + drop_last, the
    reference DataLoader's semantics (train_q_network.py:60-67,98): one
    epoch's batches must draw steps_per_epoch*B DISTINCT rows, and the
    next epoch reshuffles (different order, same coverage)."""
    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    dds = DeviceDataset(batcher, batch_size=8, seed=0, sampling="epoch")
    spe = dds.n // dds.batch_size
    epoch0 = np.concatenate([_host_rows(dds, k) for k in range(spe)])
    epoch1 = np.concatenate([_host_rows(dds, k + spe) for k in range(spe)])
    assert len(np.unique(epoch0)) == spe * dds.batch_size  # no repeats
    assert len(np.unique(epoch1)) == spe * dds.batch_size
    assert not np.array_equal(epoch0, epoch1)  # reshuffled
    # and the device draw at an epoch-1 step matches the host mirror
    dev = jax.device_get(dds.sample(spe + 1))
    host = batcher.get_batch(_host_rows(dds, spe + 1))
    for k in host:
        np.testing.assert_array_equal(dev[k], host[k], err_msg=k)


def test_sampler_lowering_captures_no_constants(feather):
    """Regression: the jitted sampler must take the HBM tables as
    ARGUMENTS. A closure formulation makes jit embed the frame table into
    the lowered program as a literal constant — at published scale that
    ships 2.89 GB inside the compile request and wedged the axon tunnel's
    compile RPC for 50+ minutes (JAX's 'large amount of constants were
    captured during lowering' warning). Lower the sampler and assert the
    program text embeds no frame-table-sized literal."""
    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    dds = DeviceDataset(batcher, batch_size=4, seed=0)
    lowered = dds._sample.lower(dds._tables, dds._base_key,
                                jnp.asarray(0, jnp.int32))
    text = lowered.as_text()
    # the frame table is ~100 KB of uint8 here; a captured-constant
    # lowering inlines it as a dense literal and blows the text up by
    # orders of magnitude. Parameters keep the program tiny.
    assert len(text) < 200_000, (
        f"sampler lowering is {len(text)} bytes — the HBM tables were "
        "captured as constants instead of passed as arguments")


def test_hbm_capacity_guard_fails_before_decode(feather):
    """A corpus that won't fit the device must fail up front with an
    actionable message (streaming fallback), not decode for minutes and
    die in an allocator OOM mid-upload."""
    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    with pytest.raises(ValueError, match="TPU.DEVICE_DATASET.*streaming"):
        DeviceDataset(batcher, batch_size=4, seed=0,
                      hbm_limit_bytes=64 * 64 * 3)  # room for ~1 frame
    # a generous limit constructs fine
    dds = DeviceDataset(batcher, batch_size=4, seed=0,
                        hbm_limit_bytes=1 << 34)
    assert np.isfinite(jax.device_get(dds.sample(0))["reward"]).all()


def test_device_batches_stream_resumes(feather):
    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    dds = DeviceDataset(batcher, batch_size=4, seed=0)
    it = dds.batches(start_step=0)
    first = [jax.device_get(next(it))["action"] for _ in range(5)]
    resumed = dds.batches(start_step=3)
    np.testing.assert_array_equal(jax.device_get(next(resumed))["action"],
                                  first[3])


def test_fused_step_matches_unfused(feather):
    """The fused sampler+train-step program (one dispatch per step, the
    production DEVICE_DATASET path) must produce the same losses and
    parameters as dispatching the standalone sampler and the train step
    separately — i.e. batch k = sample(state.step=k) exactly."""
    import optax

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.parallel import make_mesh
    from video_dqn_tpu.train.dqn import (
        TrainState,
        make_fused_device_step,
        make_train_step,
        state_shardings,
    )

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    # 'basic' head: at 64 px the extra_capacity 3x3-VALID head conv would
    # collapse the 2x2 backbone map to zero features; the fusion under
    # test is architecture-independent.
    cfg.ARCHITECTURE = "basic"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SIZE = 64
    cfg.TARGET_UPDATE_INTERVAL = 2  # span a sync boundary in 4 steps

    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL)
    dds = DeviceDataset(batcher, batch_size=8, mesh=mesh, seed=0)

    model = build_qnet(cfg)
    params, batch_stats = init_qnet(model, jax.random.key(0), image_size=64)
    tx = optax.adam(cfg.LEARNING_RATE)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params), ema_loss=jnp.zeros((), jnp.float32),
    )
    host0 = jax.device_get(state0)
    shardings = state_shardings(mesh, state0)

    step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    st = jax.device_put(host0, shardings)
    losses_a = []
    for k in range(4):
        st, m = step_fn(st, dds.sample(k))
        losses_a.append(float(m["loss"]))
    params_a = jax.device_get(st.params)

    fused = make_fused_device_step(model, cfg, tx, mesh, dds.sample_body)
    st2 = jax.device_put(host0, shardings)
    losses_b = []
    for k in range(4):
        st2, m = fused(st2, dds.tables, dds.base_key)
        losses_b.append(float(m["loss"]))
    params_b = jax.device_get(st2.params)

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        params_a, params_b)


def test_scan_chunk_matches_per_step(feather):
    """The scan-over-steps program (SCAN_CHUNK fused steps per dispatch)
    must produce the same state as the same number of per-step fused
    dispatches: the carry threads state.step through the scan, so batch
    draws, target-sync phase and EMA line up exactly."""
    import optax

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.parallel import make_mesh
    from video_dqn_tpu.train.dqn import (
        TrainState,
        make_fused_device_step,
        make_scan_device_step,
        state_shardings,
    )

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "basic"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_SIZE = 64
    cfg.TARGET_UPDATE_INTERVAL = 3  # boundary lands MID-chunk (step 3 of 4)

    batcher = QLearningBatcher(feather, one_action=True,
                               inverse_actions=True, image_size=64, seed=0)
    mesh = make_mesh(cfg.TPU.MESH_DATA, cfg.TPU.MESH_MODEL)
    dds = DeviceDataset(batcher, batch_size=8, mesh=mesh, seed=0)

    model = build_qnet(cfg)
    params, batch_stats = init_qnet(model, jax.random.key(0), image_size=64)
    tx = optax.adam(cfg.LEARNING_RATE)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params), ema_loss=jnp.zeros((), jnp.float32),
    )
    host0 = jax.device_get(state0)
    shardings = state_shardings(mesh, state0)

    fused = make_fused_device_step(model, cfg, tx, mesh, dds.sample_body)
    st = jax.device_put(host0, shardings)
    for _ in range(4):
        st, m_per_step = fused(st, dds.tables, dds.base_key)
    per_step = jax.device_get(st)

    scan = make_scan_device_step(model, cfg, tx, mesh, dds.sample_body,
                                 chunk=2)
    st2 = jax.device_put(host0, shardings)
    for _ in range(2):
        st2, m_scan = scan(st2, dds.tables, dds.base_key)
    scanned = jax.device_get(st2)

    assert int(scanned.step) == int(per_step.step) == 4

    # (a) the batch stream drawn INSIDE the scan is bitwise the per-step
    # stream (integer RNG + gathers; fusion can't change them)
    def draws(tables, base_key):
        def body(k, _):
            return k + 1, dds.sample_body(tables, base_key, k)
        _, bs = jax.lax.scan(body, jnp.int32(0), None, length=4)
        return bs

    stacked = jax.device_get(jax.jit(draws)(dds.tables, dds.base_key))
    for k in range(4):
        direct = jax.device_get(dds.sample(k))
        for key, v in direct.items():
            np.testing.assert_array_equal(stacked[key][k], v, err_msg=key)

    # (b) trajectory equivalence: same math, different XLA fusion order —
    # the loss/EMA track to float drift. Params are NOT comparable at
    # tight relative tolerance after 4 steps: early-Adam updates are
    # ~= +-lr regardless of gradient magnitude, so drift that flips a
    # near-zero gradient's sign moves that param by 2*lr. Bound the
    # absolute divergence at a few lr instead (a wrong-batch/wrong-phase
    # bug shows up in (a) and in the loss, not here).
    np.testing.assert_allclose(float(m_scan["ema_loss"]),
                               float(m_per_step["ema_loss"]), rtol=1e-3)
    lr = float(cfg.LEARNING_RATE)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=5 * lr),
        (per_step.params, per_step.target_params),
        (scanned.params, scanned.target_params))


def test_run_train_on_device_dataset(feather, tmp_path):
    """The product loop end-to-end on the HBM-resident mode: checkpoints
    written, resume continues, loss finite — on the virtual mesh."""
    import yaml

    from video_dqn_tpu.core import ExperimentConfig
    from video_dqn_tpu.train import run_train

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    cfg = {
        "DATASET": feather, "PANORAMA": False,
        "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
        "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
        "NUM_STEPS": 4, "CHECKPOINT_INTERVAL": 2,
        "TARGET_UPDATE_INTERVAL": 3, "SEED": 4,
        "TPU": {"BATCH_SIZE": 8, "IMAGE_SIZE": 96, "DEVICE_DATASET": True},
    }
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)
    config = ExperimentConfig(exp, tensorboard=False)
    _, loss = run_train(config, log_every=2)
    assert np.isfinite(loss)
    models = os.path.join(exp, "models")
    assert os.path.exists(os.path.join(models, "sample4.ckpt"))
    # resume from the step-2 checkpoint and reach step 6
    cfg["NUM_STEPS"] = 6
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)
    config = ExperimentConfig(exp, resume=True, tensorboard=False)
    run_train(config, resume_from=4)
    assert os.path.exists(os.path.join(models, "sample6.ckpt"))


def test_sharded_table_matches_replicated(feather, mesh8):
    """TPU.SHARD_DATASET: the frame table split along the data axis
    (aggregate-HBM capacity) must produce the BIT-IDENTICAL sample stream
    of the replicated layout — the shard_map psum_scatter gather changes
    only where bytes live, never what the trainer sees."""
    batcher = QLearningBatcher(feather, one_action=True, inverse_actions=True,
                               image_size=64, seed=3)
    rep = DeviceDataset(batcher, batch_size=8, mesh=mesh8, seed=3)
    shd = DeviceDataset(batcher, batch_size=8, mesh=mesh8, seed=3,
                        shard_frames=True)
    assert shd.sharded and not rep.sharded
    # the table really is split along 'data': each device holds 1/4 rows
    fr = shd.tables["frames"]
    assert fr.shape[0] % 4 == 0
    shard_shapes = {s.data.shape for s in fr.addressable_shards}
    assert shard_shapes == {(fr.shape[0] // 4,) + fr.shape[1:]}
    for step in (0, 1, 17):
        a = jax.device_get(rep.sample(step))
        b = jax.device_get(shd.sample(step))
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}@{step}")


def test_sharded_capacity_guard_uses_aggregate(feather, mesh8):
    """A corpus that overflows one device's budget but fits the aggregate
    data-axis budget must be rejected replicated (pointing at
    TPU.SHARD_DATASET) and accepted sharded."""
    batcher = QLearningBatcher(feather, one_action=True, inverse_actions=True,
                               image_size=64, seed=3)
    # table = 72 frames * 64*64*3 = 884,736 bytes; limit chosen so
    # 0.6*limit < table <= 0.6*limit*4
    limit = 1_000_000
    with pytest.raises(ValueError, match="SHARD_DATASET"):
        DeviceDataset(batcher, batch_size=8, mesh=mesh8, seed=3,
                      hbm_limit_bytes=limit)
    dds = DeviceDataset(batcher, batch_size=8, mesh=mesh8, seed=3,
                        hbm_limit_bytes=limit, shard_frames=True)
    assert dds.sharded


def test_run_train_on_sharded_device_dataset(feather, tmp_path):
    """The product loop end-to-end with TPU.SHARD_DATASET on the virtual
    mesh: checkpoints written, loss finite."""
    import yaml

    from video_dqn_tpu.core import ExperimentConfig
    from video_dqn_tpu.train import run_train

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    cfg = {
        "DATASET": feather, "PANORAMA": False,
        "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
        "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
        "NUM_STEPS": 4, "CHECKPOINT_INTERVAL": 2,
        "TARGET_UPDATE_INTERVAL": 3, "SEED": 4,
        "TPU": {"BATCH_SIZE": 8, "IMAGE_SIZE": 96, "DEVICE_DATASET": True,
                "SHARD_DATASET": True},
    }
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)
    config = ExperimentConfig(exp, tensorboard=False)
    _, loss = run_train(config, log_every=2)
    assert np.isfinite(loss)
    assert os.path.exists(os.path.join(exp, "models", "sample4.ckpt"))


def test_misaligned_scan_chunk_preserves_checkpoint_cadence(
        feather, tmp_path, capsys):
    """A user-set TPU.SCAN_CHUNK that doesn't divide log/checkpoint/total
    boundaries must NOT silently change the sample<N> cadence or overshoot
    NUM_STEPS (the reference's checkpoint cadence is a contract,
    train_q_network.py:241-247): run_train rounds it down with a loud
    warning."""
    import yaml

    from video_dqn_tpu.core import ExperimentConfig
    from video_dqn_tpu.train import run_train

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    cfg = {
        "DATASET": feather, "PANORAMA": False,
        "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
        "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
        "NUM_STEPS": 6, "CHECKPOINT_INTERVAL": 2,
        "TARGET_UPDATE_INTERVAL": 3, "SEED": 4,
        # 5 divides neither log_every=2 nor CHECKPOINT_INTERVAL=2 nor
        # NUM_STEPS=6 — unvalidated, it would checkpoint at 10, 20, ...
        # (never) and run to step 10
        "TPU": {"BATCH_SIZE": 8, "IMAGE_SIZE": 96, "DEVICE_DATASET": True,
                "SCAN_CHUNK": 5},
    }
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(cfg, f)
    config = ExperimentConfig(exp, tensorboard=False)
    _, loss = run_train(config, log_every=2)
    out = capsys.readouterr().out
    assert "SCAN_CHUNK=5" in out and "Rounding down" in out
    models = os.path.join(exp, "models")
    assert sorted(os.listdir(models)) == [
        "sample2.ckpt", "sample4.ckpt", "sample6.ckpt"]
    assert np.isfinite(loss)
