#!/usr/bin/env python
"""Per-stage TPU timing of the Mask R-CNN inference chain at the
production configuration — where do 193 ms/image go? Times each stage as
its own jitted program on the real chip: RPN NMS loop, multilevel
ROIAlign at R=256 vs 1000, the box head, the 90k-candidate final
selection, and the full model for reference.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, iters=5):
    import jax

    r = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from video_dqn_tpu.models.detector.boxes import batched_class_nms, nms
    from video_dqn_tpu.models.detector.maskrcnn import MaskRCNN, STRIDES
    from video_dqn_tpu.models.detector.roi_align import multilevel_roi_align

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0)

    # --- RPN NMS loop: 1000 candidates, 1000 iterations ------------------
    boxes = jnp.asarray(rng.random((1000, 4), np.float32) * 224)
    boxes = jnp.concatenate(
        [jnp.minimum(boxes[:, :2], boxes[:, 2:]),
         jnp.maximum(boxes[:, :2], boxes[:, 2:]) + 1], 1)
    scores = jnp.asarray(rng.random(1000, np.float32))
    f = jax.jit(lambda b, s: nms(b, s, 0.7, 1000))
    dt = timed(f, (boxes, scores), args.iters)
    print(json.dumps({"stage": "nms_1000x1000_single", "ms": round(dt * 1e3, 1)}),
          flush=True)
    fv = jax.jit(jax.vmap(lambda b, s: nms(b, s, 0.7, 1000)))
    bb = jnp.broadcast_to(boxes, (12,) + boxes.shape)
    ss = jnp.broadcast_to(scores, (12,) + scores.shape)
    dt = timed(fv, (bb, ss), args.iters)
    print(json.dumps({"stage": "nms_1000x1000_vmap12", "ms": round(dt * 1e3, 1)}),
          flush=True)

    # --- multilevel ROIAlign at R = 256 / 1000 ---------------------------
    feats = tuple(
        jnp.asarray(rng.random((224 // s, 224 // s, 256), np.float32))
        for s in STRIDES[:4]
    )
    for R in (256, 1000):
        rois = jnp.asarray(rng.random((R, 4), np.float32) * 200)
        rois = jnp.concatenate(
            [jnp.minimum(rois[:, :2], rois[:, 2:]),
             jnp.maximum(rois[:, :2], rois[:, 2:]) + 8], 1)
        g = jax.jit(lambda f_, r_: multilevel_roi_align(f_, r_, STRIDES[:4], 7))
        dt = timed(g, (feats, rois), args.iters)
        print(json.dumps({"stage": f"roi_align_R{R}", "ms": round(dt * 1e3, 1)}),
              flush=True)

    # --- box head at R = 256 / 1000 --------------------------------------
    from video_dqn_tpu.models.detector.maskrcnn import BoxHead

    bh = BoxHead(dtype=jnp.bfloat16)
    for R in (256, 1000):
        pooled = jnp.asarray(rng.random((R, 7, 7, 256), np.float32))
        v = bh.init(jax.random.key(0), pooled)
        h = jax.jit(lambda v_, p_: bh.apply(v_, p_))
        dt = timed(h, (v, pooled), args.iters)
        print(json.dumps({"stage": f"box_head_R{R}", "ms": round(dt * 1e3, 1)}),
              flush=True)

    # --- final selection: 90k candidates top-k + class NMS ---------------
    for R in (256, 1000):
        cs = jnp.asarray(rng.random(R * 90, np.float32))
        cb = jnp.asarray(rng.random((R * 90, 4), np.float32) * 224)
        cb = jnp.concatenate(
            [jnp.minimum(cb[:, :2], cb[:, 2:]),
             jnp.maximum(cb[:, :2], cb[:, 2:]) + 1], 1)
        cc = jnp.asarray(rng.integers(1, 91, R * 90))

        def fin(cs_, cb_, cc_):
            top_s, top_i = jax.lax.top_k(cs_, 1000)
            return batched_class_nms(cb_[top_i], top_s, cc_[top_i], 0.5, 100)

        k = jax.jit(fin)
        dt = timed(k, (cs, cb, cc), args.iters)
        print(json.dumps({"stage": f"final_select_R{R}", "ms": round(dt * 1e3, 1)}),
              flush=True)

    # --- full model single image, production config ----------------------
    m = MaskRCNN(dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((224, 224, 3), np.float32))
    v = m.init(jax.random.key(0), img)
    full = jax.jit(lambda v_, i_: m.apply(v_, i_))
    t0 = time.perf_counter()
    r = full(v, img)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    print(json.dumps({"stage": "full_model_compile_s",
                      "s": round(time.perf_counter() - t0, 1)}), flush=True)
    dt = timed(full, (v, img), args.iters)
    print(json.dumps({"stage": "full_model_single_prod", "ms": round(dt * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
