"""Inverse-action model: classifies the action {forward, left, right} taken
between two consecutive frames.

Capability parity with /root/reference/archs/inverse_action2.py:45-100:
frozen pretrained ResNet18 trunk on both frames (to 7x7x512 each), channel
concat to 1024, conv 1x1->256, conv 3x3->256, conv 3x3->64 (VALID), fc
576->128 (+dropout), fc ->3; returns (softmax encoding, calibration logits
from an extra 3->3 linear). The dataset labeler uses argmax of the second
output (reference dataset/process_episodes_real.py:176-177).

TPU-first: both frames are stacked into the batch dim so the trunk runs as
one conv program over 2B images; the trunk always runs with running BN
stats and its gradients are cut with stop_gradient (the reference froze
the params; here the optimizer additionally sees a zero gradient, which
keeps the train step a single pure function).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet18

Dtype = Any


class InverseActionModel(nn.Module):
    dtype: Dtype = jnp.bfloat16
    bottleneck_size: int = 3

    @nn.compact
    def __call__(self, before, after, train: bool = False, dropout_rng=None):
        b = before.shape[0]
        pair = jnp.concatenate([before, after], axis=0).astype(self.dtype)
        trunk = ResNet18(features="conv", dtype=self.dtype, name="resnet")(
            pair, train=False
        )
        trunk = jax.lax.stop_gradient(trunk)
        feats = jnp.concatenate([trunk[:b], trunk[b:]], axis=-1)  # (B,7,7,1024)

        # At the reference's 224 input the trunk map is 7x7 and the two
        # VALID 3x3 convs reduce it to 3x3 (fc input 576). Below 5x5
        # (inputs < 160 px, e.g. the 96 px self-contained loop) VALID
        # would collapse to nothing — switch to SAME there; the reference
        # geometry is untouched at its own resolution. (Static trace-time
        # decision: one compiled program per image size either way.)
        pad = "VALID" if feats.shape[1] >= 5 else "SAME"
        x = nn.Conv(256, (1, 1), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(feats)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=pad, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=pad, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(x)
        x = nn.relu(x)
        x = x.reshape((b, -1))  # 224 px: (B, 3*3*64) = (B, 576)
        x = nn.Dense(128, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        logits = nn.Dense(self.bottleneck_size, dtype=self.dtype,
                          param_dtype=jnp.float32, name="fc2")(x)
        logits = logits.astype(jnp.float32)
        encoding = jax.nn.softmax(logits, axis=-1)
        calibrated = nn.Dense(3, dtype=jnp.float32, param_dtype=jnp.float32,
                              name="fc_accuracy")(logits)
        return encoding, calibrated


def init_inverse(model: InverseActionModel, rng, image_size: int = 224):
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init({"params": rng}, x, x, False)
    return variables["params"], variables.get("batch_stats", {})


def predict_actions(model, params, batch_stats, before, after):
    """Batch action labels = argmax over the calibrated logits."""
    _, logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, before, after, False
    )
    return jnp.argmax(logits, axis=-1)
