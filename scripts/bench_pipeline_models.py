#!/usr/bin/env python
"""Dataset-pipeline model throughput on the current default device.

The reference's dataset construction is three GPU model passes that had no
measured TPU rows until now:
  * reward detector — detectron2 Mask R-CNN batch=4
    (/root/reference/dataset/detect_real_videos.py:30-72) -> FlaxDetector
  * frame filter — Places365 AlexNet indoor scores + person detector
    (/root/reference/dataset/extract_frames.py:144-168) -> AlexNetPlaces365
  * inverse-action labeling — batches of 8 frame pairs
    (/root/reference/dataset/process_episodes_real.py:164-179)
    -> InverseActionModel

Weights are random-init (throughput does not depend on weight values);
bf16, static shapes, one jitted program per stage. Prints one JSON line
per row; recorded in BASELINE.md. bench.py keeps the single-line headline
contract for the driver.

Usage: python scripts/bench_pipeline_models.py [--iters 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--detector-batches", default="1,4,8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    rng = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}))

    # --- reward detector (Mask R-CNN R50-FPN, 224 px pipeline default) ---
    from video_dqn_tpu.models.detector.maskrcnn import MaskRCNN
    from video_dqn_tpu.ops.image import normalize_imagenet

    model = MaskRCNN(dtype=jnp.bfloat16)
    dummy = jnp.zeros((224, 224, 3), jnp.float32)
    variables = model.init(rng, dummy)

    @jax.jit
    def run_det(images):  # (B, H, W, 3) uint8
        x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
        return jax.vmap(lambda im: model.apply(variables, im))(x)

    for b in [int(x) for x in args.detector_batches.split(",")]:
        imgs = jnp.asarray(
            np.random.randint(0, 255, (b, 224, 224, 3), np.uint8))
        dt = timed(run_det, (imgs,), args.iters)
        print(json.dumps({
            "metric": "maskrcnn_inference", "batch": b,
            "value": round(b / dt, 1), "unit": "imgs/sec",
            "ms_per_batch": round(dt * 1e3, 2),
        }))

    # --- frame filter (AlexNet-Places365 indoor probability) -------------
    from video_dqn_tpu.data.filters import make_indoor_classifier
    from video_dqn_tpu.models.alexnet_places import AlexNetPlaces365

    anet = AlexNetPlaces365()
    avars = anet.init(rng, jnp.zeros((1, 224, 224, 3), jnp.float32))
    classify = make_indoor_classifier(anet, avars["params"])
    for b in (64, 256):
        imgs = np.random.randint(0, 255, (b, 224, 224, 3), np.uint8)
        dt = timed(lambda x: classify(x), (imgs,), args.iters)
        print(json.dumps({
            "metric": "places365_indoor_filter", "batch": b,
            "value": round(b / dt, 1), "unit": "imgs/sec",
            "ms_per_batch": round(dt * 1e3, 2),
        }))

    # --- inverse-action labeling (pairs/sec) ------------------------------
    from video_dqn_tpu.models.inverse import InverseActionModel

    inv = InverseActionModel()
    z = jnp.zeros((1, 224, 224, 3), jnp.float32)
    ivars = inv.init(rng, z, z)

    @jax.jit
    def run_inv(before, after):
        return inv.apply(ivars, before, after, train=False)

    for b in (8, 64, 256):
        x = jnp.asarray(
            np.random.rand(b, 224, 224, 3).astype(np.float32))
        dt = timed(run_inv, (x, x), args.iters)
        print(json.dumps({
            "metric": "inverse_action_labeling", "batch": b,
            "value": round(b / dt, 1), "unit": "pairs/sec",
            "ms_per_batch": round(dt * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
