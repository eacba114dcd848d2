"""Inverse-action model training.

Capability parity with /root/reference/train_inverse_model.py:85-199:
cross-entropy on the 3-way calibrated logits, accuracy metric, periodic
validation (25 batches every 100 train batches), StepLR-style exponential
decay, `model-<iter>` checkpoints.

TPU-first: one jitted train step over the ('data','model') mesh — frozen
trunk forward (stop_gradient), head forward, CE loss, backward, Adam, all
one XLA program; uint8 batches normalized on device; LR decay via an optax
schedule instead of a host-side scheduler object.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_dqn_tpu.core import save_checkpoint
from video_dqn_tpu.core.prefetch import prefetch_to_device
from video_dqn_tpu.models.inverse import InverseActionModel, init_inverse
from video_dqn_tpu.ops.image import normalize_imagenet
from video_dqn_tpu.parallel import batch_sharding, make_mesh, replicated


class InverseTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    dropout_rng: jax.Array


def create_inverse_state(
    lr: float = 1e-3,
    lr_decay: float = 0.9,
    decay_every_steps: int = 1000,
    weight_decay: float = 0.0,
    seed: int = 0,
    image_size: int = 224,
    dtype=jnp.bfloat16,
    backbone_weights: str = "",
) -> Tuple[InverseActionModel, InverseTrainState, optax.GradientTransformation]:
    model = InverseActionModel(dtype=dtype)
    params, batch_stats = init_inverse(model, jax.random.key(seed), image_size)
    if backbone_weights:
        # the trunk is FROZEN (stop_gradient) — without pretrained weights
        # it would stay random forever; the reference builds it from
        # resnet18(pretrained=True) (/root/reference/archs/inverse_action2.py:50)
        from video_dqn_tpu.models.torch_convert import (
            convert_resnet18,
            load_torch_state_dict,
        )
        from video_dqn_tpu.train.dqn import _graft

        rparams, rstats = convert_resnet18(load_torch_state_dict(backbone_weights))
        params = dict(params)
        batch_stats = dict(batch_stats)
        params["resnet"] = _graft(params["resnet"], rparams, "resnet/")
        batch_stats["resnet"] = _graft(batch_stats["resnet"], rstats, "resnet/")
        print(f"Inverse trunk initialized from {backbone_weights}")
    else:
        print(
            "WARNING: inverse trunk is frozen at random init; pass "
            "backbone_weights (torchvision resnet18 state dict) to match "
            "the reference's pretrained trunk."
        )
    schedule = optax.exponential_decay(
        init_value=lr, transition_steps=decay_every_steps, decay_rate=lr_decay,
        staircase=True,
    )
    if weight_decay > 0:
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        tx = optax.adam(schedule)
    state = InverseTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # raw uint32 key data (typed key arrays don't serialize into
        # checkpoints); wrapped back at use inside the step
        dropout_rng=jax.random.key_data(jax.random.key(seed + 1)),
    )
    return model, state, tx


def _prep(images: jax.Array) -> jax.Array:
    x = images
    if x.ndim == 5:  # (B,1,H,W,3) single-frame stacks
        x = x[:, 0]
    return normalize_imagenet(x.astype(jnp.float32) / 255.0)


def make_inverse_step(model: InverseActionModel, tx):
    def loss_fn(params, batch_stats, rng, batch):
        _, logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _prep(batch["before"]),
            _prep(batch["after"]),
            True,
            rngs={"dropout": rng},
        )
        labels = batch["action"].astype(jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    def step_fn(state: InverseTrainState, batch):
        rng, next_rng = jax.random.split(
            jax.random.wrap_key_data(state.dropout_rng)
        )
        next_rng = jax.random.key_data(next_rng)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, rng, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                dropout_rng=next_rng,
            ),
            {"loss": loss, "accuracy": acc},
        )

    return step_fn


def load_inverse_checkpoint(
    models_dir: str,
    step: Optional[int] = None,
    image_size: int = 224,
) -> Tuple[InverseActionModel, InverseTrainState]:
    """Restore an inverse model trained by run_inverse_train (sample<N>.ckpt
    files under `models_dir`). The reference loads its inverse model from a
    torch checkpoint (/root/reference/dataset/process_episodes_real.py:169);
    this is the same seam for checkpoints this framework trained itself —
    dataset/process_episodes_real.py --inverse-flax drives it."""
    from video_dqn_tpu.core import latest_checkpoint_step, restore_checkpoint

    if step is None:
        step = latest_checkpoint_step(models_dir)
        if step is None:
            raise FileNotFoundError(
                f"no sample<N>.ckpt checkpoints under {models_dir}")
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):  # template init warning
        model, template, _ = create_inverse_state(image_size=image_size)
    state = restore_checkpoint(models_dir, step, template)
    return model, state


def make_inverse_eval(model: InverseActionModel):
    @jax.jit
    def eval_fn(params, batch_stats, batch):
        _, logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _prep(batch["before"]),
            _prep(batch["after"]),
            False,
        )
        labels = batch["action"].astype(jnp.int32)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, acc

    return eval_fn


def run_inverse_train(
    train_batcher,
    val_batcher,
    out_dir: str,
    writer=None,
    batch_size: int = 128,
    num_steps: int = 2000,
    validate_every: int = 100,
    val_batches: int = 25,
    mesh=None,
    lr: float = 1e-3,
    lr_decay: float = 0.9,
    decay_every_steps: int = 1000,
    weight_decay: float = 0.0,
    image_size: int = 224,
    dtype=jnp.bfloat16,
    seed: int = 0,
    backbone_weights: str = "",
):
    if mesh is None:
        mesh = make_mesh()
    model, state, tx = create_inverse_state(
        lr, lr_decay, decay_every_steps, weight_decay, seed, image_size,
        dtype, backbone_weights
    )
    state = jax.device_put(state, replicated(mesh))
    step_fn = jax.jit(make_inverse_step(model, tx), donate_argnums=(0,))
    eval_fn = make_inverse_eval(model)

    bshard = batch_sharding(mesh)
    batches = prefetch_to_device(train_batcher.batches(batch_size), sharding=bshard)
    os.makedirs(out_dir, exist_ok=True)
    it = 0
    for batch in batches:
        if it >= num_steps:
            break
        state, metrics = step_fn(state, batch)
        it += 1
        if it % validate_every == 0:
            vloss, vacc = [], []
            for _ in range(val_batches):
                vb = val_batcher.get_batch(batch_size=batch_size)
                vb = jax.tree_util.tree_map(lambda x: jax.device_put(x, bshard), vb)
                l, a = eval_fn(state.params, state.batch_stats, vb)
                vloss.append(float(l)), vacc.append(float(a))
            tl, ta = float(metrics["loss"]), float(metrics["accuracy"])
            if writer is not None:
                writer.add_scalar("Loss/train", tl, it)
                writer.add_scalar("Loss/val", float(np.mean(vloss)), it)
                writer.add_scalar("Accuracy/train", ta, it)
                writer.add_scalar("Accuracy/val", float(np.mean(vacc)), it)
            save_checkpoint(out_dir, it, jax.device_get(state))
    if it % validate_every != 0:
        # always leave a final checkpoint (runs shorter than
        # validate_every otherwise save nothing)
        save_checkpoint(out_dir, it, jax.device_get(state))
    return model, state
