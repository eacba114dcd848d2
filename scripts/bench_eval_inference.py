"""Secondary benchmark: eval-side panorama Q-inference throughput.

BASELINE.json north-star metric #2 ("eval panorama Q-inferences/sec;
batched 12 views x 5 classes per device call"): measures the jitted
batched scorer from eval/evaluate.make_model_scorer — 12 uint8 views in,
12 per-class-max Q values out — on the current default device.

Also measures the fused mapping program (12-view unproject+bin) since the
two dominate a semantic-reasoning stop. Results recorded in BASELINE.md.
"""

import sys
import time

sys.path.insert(0, ".")


def main(views=12, iters=20):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from video_dqn_tpu.eval.evaluate import make_model_scorer
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.core import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "extra_capacity"
    model = build_qnet(cfg)
    params, stats = init_qnet(model, jax.random.key(0), image_size=224)
    scorer = make_model_scorer(model, params, stats, class_index=4)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (views, 224, 224, 3), np.uint8)

    scorer(images)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = scorer(images)
    dt = time.perf_counter() - t0
    print(f"panorama_q_inferences_per_sec: {views * iters / dt:.1f} "
          f"(views/sec; {dt / iters * 1000:.1f} ms per 12-view stop)")

    # sustained throughput with K reasoning stops in flight: the
    # batched_runner's async dispatch/gather path (pipeline_depth>1 or
    # >1 concurrent episodes) keeps K fused forwards queued on the
    # device, so per-call dispatch latency (dominated here by the axon
    # tunnel) amortizes away — this is the co-located/production
    # utilization story for the eval side (VERDICT r2 weak #2).
    from collections import deque

    from video_dqn_tpu.eval.batched_runner import make_multiclass_scorer

    mscorer = make_multiclass_scorer(model, params, stats, image_size=224)
    cls = np.full(views, 4)
    mscorer(images, cls)  # compile
    M = 32
    for K in (1, 2, 4, 8):
        handles = deque()
        t0 = time.perf_counter()
        for _ in range(M):
            handles.append(mscorer.dispatch(images, cls))
            if len(handles) >= K:
                mscorer.gather(handles.popleft())
        while handles:
            mscorer.gather(handles.popleft())
        dt = time.perf_counter() - t0
        print(f"pipelined_stops_in_flight_{K}: "
              f"{views * M / dt:.1f} views/sec "
              f"({dt / M * 1000:.1f} ms per 12-view stop)")

    # fused mapping program
    from video_dqn_tpu.ops.binning import observations_to_map_delta
    from video_dqn_tpu.ops.geometry import get_camera_matrix

    cam = get_camera_matrix(224, 224, 90)
    depths = jnp.asarray(rng.uniform(50, 900, (views, 224, 224)).astype(np.float32))
    locs = jnp.asarray(rng.uniform(100, 200, (views, 3)).astype(np.float32))
    args = dict(camera=cam, map_size=1201, sensor_height=125.0,
                z_bins=(20.0, 125.0), xy_resolution=5.0)
    d = observations_to_map_delta(depths, locs, cam, 1201, 125.0, (20.0, 125.0))
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for _ in range(iters):
        d = observations_to_map_delta(depths, locs, cam, 1201, 125.0, (20.0, 125.0))
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    print(f"fused_12view_mapping_ms: {dt / iters * 1000:.1f}")


if __name__ == "__main__":
    main()
