"""Attribute the per-stop eval latency over the axon tunnel.

The pipelined stops-in-flight measurement (scripts/bench_eval_inference.py)
showed queueing K reasoning stops does NOT amortize the ~65 ms per-stop
cost on this tunnel (K=2 flat, K=4/8 slower) — the opposite of the
simulated-async mechanism result on a local device. This script
decomposes one 12-view stop into its serial parts to say WHY:

  h2d:     jax.device_put of the (12,224,224,3) uint8 batch (1.8 MB)
  exec:    the jitted fused forward on device-RESIDENT input
  d2h:     fetching the (12,) float32 result
  e2e:     the product path (np in -> scores out), for cross-check

If h2d ~ e2e - exec, the stop is transfer-bound: dispatch blocks on the
copy, so in-flight queueing cannot hide it (only co-locating the host or
shrinking the payload can). Records the BASELINE.md "tunnel attribution"
row. Run with JAX_COMPILATION_CACHE_DIR=/root/.jax_cache.
"""

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, iters=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main(views=12, iters=20):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import numpy as np

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.eval.batched_runner import make_multiclass_scorer
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "extra_capacity"
    model = build_qnet(cfg)
    params, stats = init_qnet(model, jax.random.key(0), image_size=224)
    scorer = make_multiclass_scorer(model, params, stats, image_size=224)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (views, 224, 224, 3), np.uint8)
    cls = np.full(views, 4)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # end-to-end product path
    dt_e2e, _ = timeit(lambda: scorer(images, cls), iters)
    print(f"e2e_stop_ms: {dt_e2e * 1e3:.1f}")

    # host->device copy alone (uint8 batch, the payload eval actually ships)
    x5 = images[:, None]  # (12,1,224,224,3) as the scorer ships it
    def h2d():
        d = jax.device_put(x5, dev)
        d.block_until_ready()
        return d
    dt_h2d, xdev = timeit(h2d, iters)
    mb = x5.nbytes / 1e6
    print(f"h2d_ms: {dt_h2d * 1e3:.1f} ({mb:.2f} MB, "
          f"{mb / dt_h2d:.0f} MB/s)")

    # execution on device-resident input (the co-located cost)
    cdev = jax.device_put(np.asarray(cls, np.int32), dev)

    import jax.numpy as jnp
    from video_dqn_tpu.ops.image import normalize_imagenet

    @jax.jit
    def fwd(x, c):
        z = normalize_imagenet(x.astype(jnp.float32) / 255.0)
        q = model.apply({"params": params, "batch_stats": stats}, z, False)
        qc = jnp.take_along_axis(q, c[:, None, None], axis=1)[:, 0]
        return qc.max(axis=-1)

    def ex():
        out = fwd(xdev, cdev)
        out.block_until_ready()
        return out
    dt_exec, out = timeit(ex, iters)
    print(f"exec_ms: {dt_exec * 1e3:.1f}")

    # device->host fetch of the (12,) result
    dt_d2h, _ = timeit(lambda: np.asarray(out), iters)
    print(f"d2h_ms: {dt_d2h * 1e3:.2f}")

    resid = dt_e2e - dt_h2d - dt_exec - dt_d2h
    print(f"residual_ms: {resid * 1e3:.1f} "
          "(host pad/stack + dispatch RPC overhead)")


if __name__ == "__main__":
    main()
