"""Double-DQN training: one jitted, mesh-sharded train step.

Capability parity with the reference trainer
(/root/reference/train_q_network.py:84-250): double-DQN Bellman targets
(online net argmax on the after-state, target net supplies its Q,
:140-156), terminal masking (:160), LINEAR `r + Q_a - 0.1` vs
`r + gamma*Q_a` targets (:161-162), 'rect' clamp to [0,1] (:165-166),
REMOVE_BEFORE_REWARD valid-mask (:168-169), ground-truth regression with
NaN masking for VALUE_LEARNING (:170-178), Adam, target sync every
TARGET_UPDATE_INTERVAL *before* the update (:215-216), EMA(0.99) running
loss (:228-234), `sample<N>` checkpoints (:241-247), resume (:192-198),
BOOTSTRAP warm start (:200-206).

TPU-first design (none of this exists in the reference):
  * the THREE ResNet forwards (before/online-after/target-after) + loss +
    backward + Adam + conditional target sync are ONE compiled XLA program;
    with frozen-BN architectures the online after-state pass (argmax-only,
    zero cotangent) runs under stop_gradient so XLA dead-codes its
    backward — only the before-state forward is differentiated (~23% of
    step FLOPs saved vs differentiating a folded 2B forward);
  * uint8 batches are normalized on device (fused into the first conv's
    HBM read) — host ships 4x fewer bytes;
  * state lives sharded on a ('data','model') mesh and is donated, so
    params/opt-state never round-trip to host; gradient reduction is an
    XLA psum over ICI;
  * target-net sync is a lax.cond on the device-resident step counter —
    no host round trip, no recompilation.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_dqn_tpu.core import (
    latest_checkpoint_step,
    restore_checkpoint,
    save_checkpoint,
)
from video_dqn_tpu.core.prefetch import prefetch_to_device
from video_dqn_tpu.models.qnet import build_qnet, init_qnet
from video_dqn_tpu.ops.image import normalize_imagenet
from video_dqn_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    target_params: Any
    target_batch_stats: Any
    opt_state: Any
    # device-resident EMA(0.99) of the loss — the reference computed this on
    # host every step (train_q_network.py:228-231); keeping it on device
    # means the host only syncs at logging points.
    ema_loss: jax.Array


def _graft(dst, src, path=""):
    """Copy leaves of `src` onto matching keys of `dst` (shape-checked);
    keys absent from `dst` (e.g. the torchvision fc) are ignored."""
    out = dict(dst)
    for k, v in dst.items():
        if k not in src:
            continue
        if isinstance(v, dict):
            out[k] = _graft(v, src[k], f"{path}{k}/")
        else:
            leaf = jnp.asarray(src[k], dtype=v.dtype)
            assert leaf.shape == v.shape, (
                f"backbone graft shape mismatch at {path}{k}: "
                f"{leaf.shape} vs {v.shape}"
            )
            out[k] = leaf
    return out


def load_backbone_weights(config, params, batch_stats):
    """Initialize the ResNet18 backbone from a torchvision state dict,
    as the reference does with resnet18(pretrained=True)
    (/root/reference/archs/HabitatDQNMultiAction.py:12,30-34).

    With ARCHITECTURE='extra_capacity' the backbone BN always runs in
    inference mode, so the grafted running statistics are exactly what the
    forward consumes — leaving them at random init (mean 0, var 1) would
    be a silent, permanent divergence from the reference recipe."""
    path = getattr(config, "BACKBONE_WEIGHTS", "")
    if not path:
        if config.ARCHITECTURE == "extra_capacity":
            print(
                "WARNING: BACKBONE_WEIGHTS is unset — the backbone is random "
                "and extra_capacity freezes its BatchNorm statistics at "
                "random-init values. The reference trains from ImageNet "
                "pretrained resnet18; see scripts/convert_weights.py."
            )
        return params, batch_stats
    from video_dqn_tpu.models.torch_convert import (
        convert_resnet18,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(path)
    rparams, rstats = convert_resnet18(sd)
    params = dict(params)
    batch_stats = dict(batch_stats)
    params["resnet"] = _graft(params["resnet"], rparams, "resnet/")
    batch_stats["resnet"] = _graft(batch_stats["resnet"], rstats, "resnet/")
    print(f"Backbone initialized from {path}")
    return params, batch_stats


def create_train_state(config, rng) -> Tuple[Any, TrainState, optax.GradientTransformation]:
    model = build_qnet(config)
    tpu = getattr(config, "TPU", None)
    image_size = int(tpu.IMAGE_SIZE) if tpu is not None and "IMAGE_SIZE" in tpu else 224
    params, batch_stats = init_qnet(model, rng, image_size=image_size)
    params, batch_stats = load_backbone_weights(config, params, batch_stats)
    tx = optax.adam(config.LEARNING_RATE)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=opt_state,
        ema_loss=jnp.zeros((), jnp.float32),
    )
    return model, state, tx


def _prep(images: jax.Array) -> jax.Array:
    """uint8 (B,F,H,W,3) -> normalized float; folded into the step."""
    return normalize_imagenet(images.astype(jnp.float32) / 255.0)


def make_loss_fn(model, config):
    gamma = float(config.GAMMA)
    linear = bool(config.LINEAR)
    rect = config.LOSS_CLIP == "rect"
    on_gt = bool(config.TRAIN_ON_GROUND_TRUTH)
    value_learning = bool(config.VALUE_LEARNING)
    remove_before = bool(config.REMOVE_BEFORE_REWARD)
    mutable_bn = not model.extra_capacity

    def loss_fn(params, target_params, batch_stats, target_batch_stats, batch):
        before = _prep(batch["before"])
        after = _prep(batch["after"])
        b = before.shape[0]

        variables = {"params": params, "batch_stats": batch_stats}
        if on_gt:
            # single forward on the before-state only
            if mutable_bn:
                q_before, mut = model.apply(
                    variables, before, True, mutable=["batch_stats"]
                )
                new_stats = mut["batch_stats"]
            else:
                q_before = model.apply(variables, before, False)
                new_stats = batch_stats
        elif mutable_bn:
            # basic arch (trainable BN): before+after as ONE 2B-batch
            # train-mode forward so both halves update the running stats
            both = jnp.concatenate([before, after], axis=0)
            q_both, mut = model.apply(variables, both, True, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
            q_before, q_after_online = q_both[:b], q_both[b:]
        else:
            # extra_capacity (frozen BN): the after-state online Q only
            # feeds an argmax (zero cotangent), but inside the same
            # differentiated forward XLA still pays its full backward —
            # measured 23.3 GFLOP/frame ~= 3 forwards + a 2B backward.
            # Running it under stop_gradient(params) lets XLA dead-code
            # the after-half backward: ~23% of step FLOPs.
            q_before = model.apply(variables, before, False)
            q_after_online = model.apply(
                {
                    "params": jax.lax.stop_gradient(params),
                    "batch_stats": batch_stats,
                },
                after,
                False,
            )
            new_stats = batch_stats

        act = batch["action"].astype(jnp.int32)  # (B,)
        # Q of the taken action for each of the 5 classes: (B, C).
        # mode='clip': single-action heads (VALUE_LEARNING/ONE_ACTION) are
        # fed action labels from the inverse model; out-of-range indices
        # clamp to the only action instead of gather-filling NaN.
        q_b = jnp.take_along_axis(
            q_before, act[:, None, None], axis=2, mode="clip"
        )[..., 0]

        if on_gt:
            gt = batch["gt"]
            if value_learning:
                mask = 1.0 - jnp.isnan(gt).astype(jnp.float32)
                gt0 = jnp.nan_to_num(gt, nan=0.0)
                losses = 0.5 * (q_b * mask - gt0) ** 2
            else:
                losses = 0.5 * (q_b - gt) ** 2
        else:
            q_after_target = model.apply(
                {"params": target_params, "batch_stats": target_batch_stats},
                after,
                False,
            )
            best = jnp.argmax(q_after_online, axis=-1)  # (B, C) online picks
            q_a = jnp.take_along_axis(q_after_target, best[..., None], axis=2)[..., 0]
            q_a = jax.lax.stop_gradient(q_a) * (1.0 - batch["terminal"])
            if linear:
                targets = batch["reward"] + (q_a - 0.1)
            else:
                targets = batch["reward"] + gamma * q_a
            if rect:
                targets = jnp.clip(targets, 0.0, 1.0)
            losses = 0.5 * (q_b - targets) ** 2
            if remove_before:
                losses = losses * batch["valid_mask"]

        return losses.mean(), new_stats

    return loss_fn


def make_train_step(model, config, tx):
    """Returns step(state, batch) -> (state, metrics); jit it with shardings."""
    loss_fn = make_loss_fn(model, config)
    sync_every = int(config.TARGET_UPDATE_INTERVAL)

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        step = state.step + 1
        # target sync BEFORE the update, at step % interval == 0
        # (reference order, train_q_network.py:213-216)
        do_sync = (step % sync_every) == 0
        target_params = jax.tree_util.tree_map(
            lambda t, p: jnp.where(do_sync, p, t), state.target_params, state.params
        )
        target_stats = jax.tree_util.tree_map(
            lambda t, p: jnp.where(do_sync, p, t),
            state.target_batch_stats,
            state.batch_stats,
        )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, target_params, state.batch_stats, target_stats, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jnp.where(
            state.step == 0, loss, state.ema_loss * 0.99 + loss * 0.01
        )
        new_state = TrainState(
            step=step,
            params=params,
            batch_stats=new_stats,
            target_params=target_params,
            target_batch_stats=target_stats,
            opt_state=opt_state,
            ema_loss=ema,
        )
        return new_state, {"loss": loss, "ema_loss": ema}

    return step_fn


def state_shardings(mesh, state: TrainState) -> TrainState:
    """Sharding pytree matching TrainState: params (and adam moments) by
    the TP partition rules, everything else replicated."""
    pshard = param_shardings(mesh, state.params)
    rep = replicated(mesh)

    def like_params(part):
        if hasattr(part, "mu"):  # optax.ScaleByAdamState
            return part._replace(count=rep, mu=pshard, nu=pshard)
        return jax.tree_util.tree_map(lambda _: rep, part)

    opt = jax.tree_util.tree_map(
        like_params, state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
    )
    return TrainState(
        step=rep,
        params=pshard,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        target_params=pshard,
        target_batch_stats=jax.tree_util.tree_map(lambda _: rep, state.target_batch_stats),
        opt_state=opt,
        ema_loss=rep,
    )


def jit_train_step(model, config, tx, mesh, state: TrainState):
    """Place the state sharded on the mesh and jit the donated step.
    Output shardings follow input shardings by XLA propagation."""
    from video_dqn_tpu.parallel import multihost

    shardings = state_shardings(mesh, state)
    sharded_state = multihost.place_tree(state, shardings)
    jitted = jax.jit(make_train_step(model, config, tx), donate_argnums=(0,))
    return jitted, sharded_state, shardings


def _multihost_batch_stream(batcher, batch_size: int, mesh):
    """Host-fed infeed for a multi-process run: every process derives the
    SAME global row-index sequence (the batcher RNG is seeded identically
    everywhere), decodes ONLY its own global_batch_slice of each batch,
    and contributes it to a globally-sharded array
    (multihost.make_global_array). Decode work therefore scales 1/P per
    host — the multi-host analogue of the reference's DataLoader workers
    (train_q_network.py:98), which had no multi-machine form at all."""
    from video_dqn_tpu.parallel import multihost

    sharding = batch_sharding(mesh)
    start, size = multihost.global_batch_slice(batch_size)
    for rows in batcher.index_stream(batch_size):
        local = batcher.get_batch(rows[start : start + size])
        yield {
            k: multihost.make_global_array(
                sharding, (batch_size,) + v.shape[1:], v, start)
            for k, v in local.items()
        }


def make_fused_device_step(model, config, tx, mesh, sample_body):
    """Sampler + train step as ONE jitted program for the HBM-resident
    dataset mode: `fused(state, tables, base_key) -> (state, metrics)`
    draws batch `state.step` on device and consumes it in the same XLA
    program. One dispatch per step instead of two — each extra dispatch
    costs ~13 ms through the tunneled runtime (BASELINE.md published-scale
    rows), and the reference's DataLoader-per-step shape has no analogue
    of this fusion at all (/root/reference/train_q_network.py:98,219).

    Batch k = sample_body(k) at k = state.step, which equals the loop's
    sample_number at the top of every iteration (including after `-r`
    resume), so the fused stream is BIT-IDENTICAL to the unfused one
    (pinned by tests/test_device_dataset.py::test_fused_step_matches_unfused).
    """
    step_fn = make_train_step(model, config, tx)
    bshard = batch_sharding(mesh)

    def fused(state: TrainState, tables, base_key):
        batch = sample_body(tables, base_key, state.step)
        batch = jax.lax.with_sharding_constraint(batch, bshard)
        return step_fn(state, batch)

    return jax.jit(fused, donate_argnums=(0,))


def make_scan_device_step(model, config, tx, mesh, sample_body, chunk: int):
    """`chunk` fused sampler+train steps inside ONE XLA program
    (`lax.scan` over the fused body): `scan(state, tables, base_key) ->
    (state, last-step metrics)`. The per-step dispatch disappears from
    the steady state entirely — on the tunneled runtime a dispatch costs
    ~13 ms against a ~56 ms batch-256 step, and even co-located hosts pay
    Python + runtime enqueue per step. State is carried through the scan;
    each scan iteration draws batch `state.step` exactly like the
    per-step fused program, so the sample stream (integer RNG draws —
    bit-identical), target-sync phase (lax.cond on the in-carry step) and
    EMA recursion are the same as `chunk` sequential fused dispatches;
    only XLA fusion order differs, leaving ~1e-4 float drift (pinned by
    tests/test_device_dataset.py::test_scan_chunk_matches_per_step).

    The caller picks `chunk` to divide every host-side boundary (logging,
    CHECKPOINT_INTERVAL, total steps) — run_train's auto mode uses their
    gcd — so no host action ever lands mid-chunk. Only the last step's
    metrics are returned: the loop logs at chunk multiples, and the EMA
    loss already integrates the interior steps on device.
    """
    step_fn = make_train_step(model, config, tx)
    bshard = batch_sharding(mesh)

    def scan_fn(state: TrainState, tables, base_key):
        def body(st, _):
            batch = sample_body(tables, base_key, st.step)
            batch = jax.lax.with_sharding_constraint(batch, bshard)
            return step_fn(st, batch)

        state, metrics = jax.lax.scan(body, state, None, length=chunk)
        return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return jax.jit(scan_fn, donate_argnums=(0,))


def run_train(
    config,
    resume_from: int = -1,
    batcher=None,
    mesh=None,
    max_steps: Optional[int] = None,
    log_every: int = 100,
    visualize_hook=None,
):
    """Full training loop. `config` is an ExperimentConfig (needs .folder,
    .writer, .models_dir plus the flat cfg keys)."""
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    np.random.seed(config.SEED)
    batch_stream = None
    if batcher is None:
        cache_mb = int(getattr(config.TPU, "DECODE_CACHE_MB", 0))
        batcher_kwargs = dict(
            location=config.DATASET,
            one_action=True,
            confidence_reward=config.CONFIDENCE_REWARD,
            value_learning=config.VALUE_LEARNING,
            inverse_actions=config.USE_INVERSE_ACTIONS,
            previous_images=config.PREVIOUS_IMAGES,
            seed=config.SEED,
            image_size=int(config.TPU.IMAGE_SIZE),
            cache_bytes=cache_mb * (1 << 20) if cache_mb > 0 else None,
        )
        batcher = QLearningBatcher(**batcher_kwargs)
        print(f"Load data from {config.DATASET}")
        print(f"Reward Ratio: {batcher.reward_percentage()}")
        n_workers = int(getattr(config.TPU, "DECODE_WORKERS", 0))
        if n_workers > 0 and not getattr(config.TPU, "DEVICE_DATASET", False):
            from video_dqn_tpu.data.workers import parallel_batches

            batch_stream = parallel_batches(
                batcher_kwargs, int(config.TPU.BATCH_SIZE),
                num_workers=n_workers, seed=config.SEED,
            )
            print(f"Decode workers: {n_workers}")

    if mesh is None:
        mesh = make_mesh(config.TPU.MESH_DATA, config.TPU.MESH_MODEL)
    batch_size = int(config.TPU.BATCH_SIZE)

    # Multi-host mode (jax.distributed already initialized by the CLI or
    # the orchestrator): every process runs this same loop over the global
    # mesh; host-side SIDE EFFECTS (checkpoints, metrics, value maps) are
    # primary-only, while every process participates in every dispatch.
    n_proc = jax.process_count()
    primary = jax.process_index() == 0
    if n_proc > 1:
        if batch_stream is not None:
            raise ValueError(
                "TPU.DECODE_WORKERS and multi-host training don't compose: "
                "each process already decodes only its "
                "global_batch_slice — set DECODE_WORKERS: 0")
        if batch_size % n_proc:
            raise ValueError(
                f"TPU.BATCH_SIZE {batch_size} must divide evenly across "
                f"{n_proc} processes")
        print(f"Multi-host: process {jax.process_index()}/{n_proc}, "
              f"{len(jax.local_devices())} local / {len(jax.devices())} "
              f"global devices")

    model, state, tx = create_train_state(config, jax.random.key(config.SEED))

    start_step = 0
    if resume_from > -1:
        template = jax.device_get(state)
        restored = restore_checkpoint(config.models_dir, resume_from, template)
        state = restored
        start_step = resume_from
        print(f"Resuming from sample{resume_from}")
    elif config.BOOTSTRAP:
        boot = config.BOOTSTRAP_LOCATION
        step = latest_checkpoint_step(boot)
        if step is not None:
            state = restore_checkpoint(boot, step, jax.device_get(state))
            # the reference BOOTSTRAP loads weights but its loop counter
            # starts fresh and the target net is re-synced to the loaded
            # model (train_q_network.py:190,200-208,211) — reset the
            # device step so target-sync phase and the fused sampler
            # index (= state.step) match a fresh run, and copy
            # params->target like the reference's load_state_dict.
            state = state.replace(
                step=jnp.zeros((), jnp.int32),
                target_params=jax.tree_util.tree_map(np.copy, state.params),
                target_batch_stats=jax.tree_util.tree_map(
                    np.copy, state.batch_stats),
            )
            print(f"BOOTSTRAP from {boot}/sample{step}")

    num_steps = int(max_steps if max_steps is not None else config.NUM_STEPS)
    running_loss = None
    step_increment = 1
    if getattr(config.TPU, "DEVICE_DATASET", False):
        # HBM-resident mode: decode + upload once, then sampler + train
        # step fused into ONE program — and (SCAN_CHUNK) whole chunks of
        # steps per dispatch, zero host bytes per step
        # (data/device_dataset.py rationale)
        import itertools
        import math

        from video_dqn_tpu.data.device_dataset import DeviceDataset

        dds = DeviceDataset(
            batcher, batch_size, mesh=mesh, seed=config.SEED,
            sampling=str(getattr(config.TPU, "DEVICE_SAMPLING", "epoch")),
            shard_frames=bool(getattr(config.TPU, "SHARD_DATASET", False)))
        layout = (f"sharded 1/{mesh.shape['data']} per device"
                  if dds.sharded else "replicated")
        print(f"Device dataset: {dds.n} rows, "
              f"{dds.hbm_bytes / 1e9:.2f} GB of frames in HBM ({layout})")
        from video_dqn_tpu.parallel import multihost

        shardings = state_shardings(mesh, state)
        state = multihost.place_tree(state, shardings)

        chunk = int(getattr(config.TPU, "SCAN_CHUNK", 0))
        # largest chunk dividing every host boundary: the loop only sees
        # sample_number at chunk multiples, so a chunk that doesn't divide
        # log_every / CHECKPOINT_INTERVAL / remaining steps would silently
        # change the logging+checkpoint cadence and overshoot NUM_STEPS
        # (the reference's sample<N> cadence is a contract,
        # /root/reference/train_q_network.py:241-247)
        remaining = max(num_steps - start_step, 0)
        aligned = math.gcd(math.gcd(int(log_every),
                                    int(config.CHECKPOINT_INTERVAL)),
                           remaining) or 1
        if chunk <= 0:  # auto
            chunk = aligned
        elif (int(log_every) % chunk or int(config.CHECKPOINT_INTERVAL) % chunk
              or remaining % chunk):
            safe = math.gcd(chunk, aligned) or 1
            print(
                f"WARNING: TPU.SCAN_CHUNK={chunk} does not divide the host "
                f"boundaries (log_every={log_every}, CHECKPOINT_INTERVAL="
                f"{int(config.CHECKPOINT_INTERVAL)}, remaining steps="
                f"{remaining}) — checkpoints/logs would silently skip. "
                f"Rounding down to {safe}.")
            chunk = safe
        if chunk > 1:
            print(f"Scan chunk: {chunk} steps/dispatch")
            fused_fn = make_scan_device_step(model, config, tx, mesh,
                                             dds.sample_body, chunk)
        else:
            fused_fn = make_fused_device_step(model, config, tx, mesh,
                                              dds.sample_body)
        step_increment = chunk

        def dispatch(state, _):
            return fused_fn(state, dds.tables, dds.base_key)

        batches = itertools.repeat(None)
    else:
        step_fn, state, _ = jit_train_step(model, config, tx, mesh, state)
        dispatch = step_fn
        if n_proc > 1:
            # per-process slice decode + global-array assembly; the jitted
            # step's async dispatch overlaps the next slice's decode
            batches = _multihost_batch_stream(batcher, batch_size, mesh)
        else:
            batches = prefetch_to_device(
                batch_stream if batch_stream is not None else batcher.batches(batch_size),
                sharding=batch_sharding(mesh),
                depth=int(config.TPU.PREFETCH_DEPTH),
            )
    sample_number = start_step
    # Stall defense (core/watchdog.py rationale): a dropped tunnel blocks
    # the loop forever at a dispatch/sync, so no orchestrator can restart
    # it with -r. The loop beats every iteration; the deadline must
    # therefore comfortably exceed one log interval (the longest healthy
    # stretch between device syncs). 0 = off. Env var mirrors
    # VDQN_BENCH_WATCHDOG_S; the first deadline covers cold remote
    # compile (bench.py's bound is 2700 s).
    wd_env = os.environ.get("VDQN_TRAIN_WATCHDOG_S", "").strip()
    if wd_env:
        try:
            wd_timeout = float(wd_env)
        except ValueError:
            raise ValueError(
                f"VDQN_TRAIN_WATCHDOG_S={wd_env!r} is not a number — set it "
                "to a timeout in seconds (0 disables the watchdog)"
            ) from None
    else:
        wd_timeout = float(getattr(config.TPU, "STALL_TIMEOUT_S", 0) or 0)
    watchdog = None
    if wd_timeout > 0:
        from video_dqn_tpu.core.watchdog import StallWatchdog

        # Cold-compile grace: a remote (tunneled TPU) first compile takes
        # minutes, so the first deadline is floored at bench.py's 2700 s
        # bound — but only where a remote compile exists; on the CPU
        # backend the floor would just delay catching a first-dispatch
        # hang. TPU.STALL_FIRST_TIMEOUT_S overrides the auto choice.
        first = float(getattr(config.TPU, "STALL_FIRST_TIMEOUT_S", 0) or 0)
        if first <= 0:
            remote = jax.default_backend() not in ("cpu",)
            first = max(wd_timeout, 2700.0) if remote else wd_timeout
        watchdog = StallWatchdog(wd_timeout, label="train",
                                 first_timeout_s=first)
    t0 = time.time()
    try:
        for batch in batches:
            if sample_number >= num_steps:
                break
            state, metrics = dispatch(state, batch)
            sample_number += step_increment
            if watchdog is not None:
                watchdog.beat()
            # the EMA loss lives on device; only sync at logging/checkpoint
            # boundaries so the dispatch pipeline stays full.
            if sample_number % log_every == 0:
                # a replicated scalar is readable on every process; only
                # the primary WRITES it (multi-host file-effect gating)
                running_loss = float(metrics["ema_loss"])
                if primary:
                    config.writer.add_scalar(
                        "avg_q_loss/train", running_loss, sample_number)
                    rate = log_every * batch_size / (time.time() - t0)
                    config.writer.add_scalar(
                        "frames_per_sec/train", rate, sample_number)
                t0 = time.time()
            if sample_number % int(config.CHECKPOINT_INTERVAL) == 0:
                if primary:
                    from video_dqn_tpu.parallel import multihost

                    # device_get_local: non-collective read of this
                    # process's shards (covers replicated + in-process TP
                    # layouts), so gating it primary-only cannot deadlock
                    save_checkpoint(config.models_dir, sample_number,
                                    multihost.device_get_local(state))
                    # value-map rendering at checkpoints — properly gated
                    # (the reference's equivalent crashed on an undefined
                    # houses list when VISUALIZATION_DATA_ROOT was unset,
                    # train_q_network.py:248-250)
                    if visualize_hook is not None and config.VISUALIZATION_DATA_ROOT:
                        visualize_hook(model, state, sample_number)
                if watchdog is not None:
                    watchdog.beat()
    finally:
        if watchdog is not None:
            watchdog.stop()
    return state, running_loss
