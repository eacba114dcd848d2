"""Multi-class Q-network (flagship model).

Capability parity with the reference HabitatDQNMultiAction
(/root/reference/archs/HabitatDQNMultiAction.py:8-54): ResNet18 backbone,
two head variants, optional 4-frame panorama/history stacking, output
(B, num_classes, action_dim) Q-values.

TPU-first differences from the reference design:
  * NHWC + bfloat16 compute; all panorama frames are folded into the batch
    dim and run through the backbone as ONE conv program (the reference
    loops frames in Python, :49-52), so the MXU sees B*F-sized batches.
  * BatchNorm semantics are explicit: with extra_capacity the backbone
    always uses running statistics (the reference's set_train() keeps the
    shared resnet modules in eval mode, :37-40); with the basic head the
    backbone BN trains.
  * head: 'extra_capacity' = conv(512->64, 3x3 VALID) + flatten(1600/frame)
    -> MLP 512 -> 256 -> A*C (:30-31); 'basic' = global-pool 512/frame ->
    Dense A*C (:33-34).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet18

Dtype = Any


class HabitatDQN(nn.Module):
    action_dim: int = 3
    num_classes: int = 5
    extra_capacity: bool = False
    panorama: bool = True
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @property
    def num_frames(self) -> int:
        return 4 if self.panorama else 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, F, H, W, 3) or (B, H, W, 3) when single-frame."""
        if x.ndim == 4:
            x = x[:, None]
        if x.shape[1] != self.num_frames:
            raise ValueError(
                f"expected {self.num_frames} frames, got shape {x.shape}"
            )
        b, f = x.shape[0], x.shape[1]
        x = x.reshape((b * f,) + x.shape[2:]).astype(self.dtype)

        backbone_cls = ResNet18
        if self.remat:
            backbone_cls = nn.remat(ResNet18, static_argnums=(2,))
        # extra_capacity keeps the backbone BN in inference mode even while
        # training (reference set_train(), HabitatDQNMultiAction.py:37-40).
        backbone_train = train and not self.extra_capacity

        if self.extra_capacity:
            feats = backbone_cls(features="conv", dtype=self.dtype,
                                 name="resnet")(x, backbone_train)
            feats = nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype,
                            param_dtype=jnp.float32, name="head_conv")(feats)
            feats = nn.relu(feats)
            feats = feats.reshape((b, -1))  # (B, F*5*5*64) = (B, F*1600)
            h = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                         name="top_dense1")(feats)
            h = nn.relu(h)
            h = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32,
                         name="top_dense2")(h)
            h = nn.relu(h)
            out = nn.Dense(self.action_dim * self.num_classes,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="top_dense3")(h)
        else:
            feats = backbone_cls(features="pool", dtype=self.dtype,
                                 name="resnet")(x, backbone_train)
            feats = feats.reshape((b, -1))  # (B, F*512)
            out = nn.Dense(self.action_dim * self.num_classes,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="top_dense1")(feats)
        out = out.astype(jnp.float32)
        return out.reshape((b, self.num_classes, self.action_dim))


def build_qnet(config) -> HabitatDQN:
    """Mirror of the reference build_model config plumbing
    (/root/reference/train_q_network.py:36-48): VALUE_LEARNING/ONE_ACTION
    collapse to a single action head; PANORAMA or PREVIOUS_IMAGES enable
    4-frame stacking."""
    actions = 1 if (config.VALUE_LEARNING or config.ONE_ACTION) else 3
    tpu = getattr(config, "TPU", None)
    compute_dtype = jnp.dtype(tpu.COMPUTE_DTYPE) if tpu is not None else jnp.bfloat16
    return HabitatDQN(
        action_dim=actions,
        num_classes=5,
        extra_capacity=(config.ARCHITECTURE == "extra_capacity"),
        panorama=(config.PANORAMA or config.PREVIOUS_IMAGES),
        dtype=compute_dtype,
        remat=bool(tpu.REMAT) if tpu is not None else False,
    )


def init_qnet(model: HabitatDQN, rng, image_size: int = 224):
    x = jnp.zeros((1, model.num_frames, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, x, False)
    return variables["params"], variables.get("batch_stats", {})


def qnet_apply(model: HabitatDQN, params, batch_stats, x, train: bool = False):
    """Functional forward. Returns (q_values, new_batch_stats)."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train and not model.extra_capacity:
        q, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
        return q, mutated["batch_stats"]
    q = model.apply(variables, x, False)
    return q, batch_stats
