"""Runtime plumbing tests: host->HBM prefetcher, the profiling timer,
and the multi-host (two-process) distributed backend."""

import os
import time

import numpy as np
import pytest

import jax

from video_dqn_tpu.core.prefetch import prefetch_to_device
from video_dqn_tpu.core.profiling import StepTimer
from video_dqn_tpu.core.metrics import MetricsWriter, read_metrics


def test_prefetch_yields_device_batches():
    batches = ({"x": np.full((4,), i, np.float32)} for i in range(5))
    out = list(prefetch_to_device(batches, depth=2))
    assert len(out) == 5
    assert isinstance(out[0]["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), np.full(4, 3))


def test_prefetch_propagates_producer_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise RuntimeError("decoder exploded")

    it = prefetch_to_device(gen(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="decoder exploded"):
        for _ in it:
            pass


def test_prefetch_transform_applied():
    batches = ({"x": np.ones(2)} for _ in range(2))
    out = list(
        prefetch_to_device(batches, transform=lambda b: {"x": b["x"] * 3})
    )
    np.testing.assert_array_equal(np.asarray(out[0]["x"]), [3, 3])


def test_step_timer_logs_rates(tmp_path):
    w = MetricsWriter(str(tmp_path / "m"), tensorboard=False)
    timer = StepTimer(writer=w)
    with timer.section(step=1, tag="train", items=10):
        time.sleep(0.01)
    w.flush()
    recs = read_metrics(str(tmp_path / "m"), "perf/train_sec")
    assert len(recs) == 1 and recs[0]["value"] >= 0.01
    rate = read_metrics(str(tmp_path / "m"), "perf/train_items_per_sec")
    assert len(rate) == 1 and rate[0]["value"] > 0
    assert "train" in timer.summary()


def test_prefetch_producer_unblocks_on_early_stop():
    """A consumer that stops early must not leave the producer thread
    blocked in q.put forever (ADVICE round 1): the producer re-checks the
    stop event while the queue is full and exits promptly."""
    import threading
    import time

    produced = []
    release = threading.Event()

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.ones((2,)) * i}

    it = prefetch_to_device(gen(), depth=1)
    next(it)
    it.close()  # generator exit -> finally: stop + drain

    # give the daemon thread a beat to notice the stop event
    deadline = time.time() + 5.0
    n_after_close = len(produced)
    while time.time() < deadline:
        time.sleep(0.2)
        if len(produced) == n_after_close:
            break
        n_after_close = len(produced)
    # producer stopped long before exhausting the 100-item stream
    assert len(produced) < 100


def test_parallel_decode_workers_deterministic(tmp_path):
    """Worker-pool batches must match the same-seed index stream decoded
    in one process (re-ordering to submission sequence makes the stream
    deterministic regardless of worker scheduling)."""
    from video_dqn_tpu.data.qlearning import QLearningBatcher
    from video_dqn_tpu.data.synthetic import make_synthetic_dataset
    from video_dqn_tpu.data.workers import parallel_batches

    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=2,
                                     frames_per_video=16, image_size=32)
    kwargs = dict(location=feather, one_action=True, inverse_actions=True,
                  image_size=32, seed=5)

    ref_batcher = QLearningBatcher(**kwargs)
    # both transports (shared-memory ring and pickle/pipe) must emit the
    # bit-identical same-seed stream as one-process decoding
    for transport in ("shm", "pipe"):
        stream = parallel_batches(kwargs, batch_size=4, num_workers=2,
                                  seed=7, n_samples=6, transport=transport)
        got = list(stream)
        assert len(got) == 6
        rng = np.random.default_rng(7)
        for batch in got:
            idx = rng.integers(0, len(ref_batcher), 4)
            expect = ref_batcher.get_batch(indices=idx)
            np.testing.assert_array_equal(batch["before"], expect["before"])
            np.testing.assert_array_equal(batch["after"], expect["after"])
            np.testing.assert_array_equal(batch["action"], expect["action"])
            np.testing.assert_array_equal(batch["reward"], expect["reward"])


def test_decode_cache_budget(tmp_path):
    """cache_bytes: decoded frames are served from RAM on later epochs,
    insertion stops at the budget (no eviction thrash), and cached batches
    are bit-identical to decoded ones."""
    from video_dqn_tpu.data.qlearning import QLearningBatcher
    from video_dqn_tpu.data.synthetic import make_synthetic_dataset

    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=2,
                                     frames_per_video=16, image_size=32)
    kwargs = dict(location=feather, one_action=True, inverse_actions=True,
                  image_size=32, seed=5)
    plain = QLearningBatcher(**kwargs)
    cached = QLearningBatcher(**kwargs, cache_bytes=1 << 30)
    idx = np.arange(len(plain))
    a = plain.get_batch(indices=idx)
    b = cached.get_batch(indices=idx)   # fills the cache
    c = cached.get_batch(indices=idx)   # served from RAM
    np.testing.assert_array_equal(a["before"], b["before"])
    np.testing.assert_array_equal(b["before"], c["before"])
    np.testing.assert_array_equal(b["after"], c["after"])
    assert cached._cache_used > 0

    # tiny budget: only a few frames fit; results still correct
    frame_bytes = 32 * 32 * 3
    tight = QLearningBatcher(**kwargs, cache_bytes=3 * frame_bytes)
    d = tight.get_batch(indices=idx)
    np.testing.assert_array_equal(a["before"], d["before"])
    np.testing.assert_array_equal(a["after"], d["after"])
    assert tight._cache_used <= 3 * frame_bytes
    d2 = tight.get_batch(indices=idx)
    np.testing.assert_array_equal(a["before"], d2["before"])


def test_parallel_decode_workers_propagate_errors(tmp_path):
    from video_dqn_tpu.data.synthetic import make_synthetic_dataset
    from video_dqn_tpu.data.workers import parallel_batches

    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=1,
                                     frames_per_video=10, image_size=32)
    kwargs = dict(location=feather, one_action=True, inverse_actions=True,
                  image_size=32)
    # break an image file so a worker raises mid-stream
    import glob
    import os

    victim = sorted(glob.glob(str(tmp_path / "ds" / "frames" / "*" / "*.jpg")))[0]
    os.remove(victim)
    with pytest.raises(Exception):
        list(parallel_batches(kwargs, batch_size=8, num_workers=1,
                              n_samples=20))


def test_normalize_platforms_keeps_cpu_backend_available():
    """Regression: JAX_PLATFORMS=axon (env-provided) must not drop the
    host CPU backend — host-pinned ops (ops/scans.label_video_host, the
    dataset assembly path) require jax.local_devices(backend='cpu').
    Accelerator-first lists gain cpu as a SECONDARY backend (first entry
    still picks the default device); cpu-first lists pass through exactly
    so a CPU-requested run never initializes the axon tunnel client."""
    from video_dqn_tpu import _normalize_platforms

    assert _normalize_platforms("axon") == "axon,cpu"
    assert _normalize_platforms("tpu") == "tpu,cpu"
    assert _normalize_platforms("axon,cpu") == "axon,cpu"
    assert _normalize_platforms("cpu") == "cpu"
    assert _normalize_platforms("cpu,axon") == "cpu,axon"
    assert _normalize_platforms("") is None
    assert _normalize_platforms(None) is None


@pytest.mark.slow
def test_multihost_two_process_train_step(tmp_path):
    """SURVEY section-5 distributed backend, executed for REAL: two
    coordinated OS processes (jax.distributed + gloo CPU collectives, 4
    virtual devices each) form one 8-device (4x2) global mesh, each feeds
    only its own half of the global batch (multihost.global_batch_slice +
    make_global_array), and both run one full double-DQN train step. The
    replicated loss must come back identical on both processes — the proof
    that the DCN-spanning mesh computes one global program rather than two
    disjoint ones. (Round-3 Missing #3: this path had never executed with
    more than one process.)"""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    # the smoke forces its own virtual-CPU platform; scrub this suite's
    # 8-device XLA_FLAGS so each child provisions exactly 4
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "-m", "video_dqn_tpu.parallel.multihost_smoke",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    procs = [spawn(0), spawn(1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    losses = []
    for pid, out in enumerate(outs):
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
        assert len(lines) == 1, out[-2000:]
        assert f"process={pid}/2" in lines[0]
        assert "mesh=(4x2)" in lines[0]
        losses.append(float(lines[0].split("loss=")[1]))
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1], losses
    # primary gating: only process 0 runs primary_only side effects
    assert "MULTIHOST_PRIMARY_OK" in outs[0]
    assert "MULTIHOST_PRIMARY_OK" not in outs[1]


@pytest.mark.slow
def test_multihost_product_trainer_matches_single_process(tmp_path):
    """Multi-host as a PRODUCT mode (round-4 verdict #1): two coordinated
    OS processes running the UNCHANGED train CLI
    (`train_q_network.py --coordinator ...`) over one global 4x2 mesh,
    each decoding only its global_batch_slice, for 24 run_train steps
    spanning checkpoint (8) AND target-sync (10) boundaries, must
      (a) reproduce the single-process 8-device run's loss trace, and
      (b) write checkpoints + metrics from process 0 ONLY."""
    import json
    import socket
    import subprocess
    import sys

    import yaml

    from video_dqn_tpu.data.synthetic import make_synthetic_dataset

    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=3,
                                     frames_per_video=24, image_size=96)
    cfg = {
        "DATASET": feather, "PANORAMA": False,
        "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
        "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
        "NUM_STEPS": 24, "CHECKPOINT_INTERVAL": 8,
        "TARGET_UPDATE_INTERVAL": 10, "SEED": 4,
        "TPU": {"BATCH_SIZE": 8, "IMAGE_SIZE": 96, "MESH_MODEL": 2,
                "COMPUTE_DTYPE": "float32"},
    }
    exps = {}
    for name in ("single", "mh0", "mh1"):
        exp = tmp_path / f"exp_{name}"
        exp.mkdir()
        with open(exp / "config.yml", "w") as f:
            yaml.safe_dump(cfg, f)
        exps[name] = str(exp)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_env = dict(os.environ)
    base_env["PYTHONPATH"] = repo
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        base_env.pop(k, None)

    # ---- single-process 8-device oracle --------------------------------
    env1 = dict(base_env)
    env1.update(JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=8"
                          " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                          " --xla_cpu_collective_call_terminate_timeout_seconds=86400")
    r = subprocess.run(
        [sys.executable, "train_q_network.py", "--log-every", "4",
         exps["single"]],
        cwd=repo, env=env1, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]

    # ---- two-process fleet through the SAME CLI -------------------------
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "train_q_network.py",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--multihost-platform", "cpu", "--local-devices", "4",
             "--log-every", "4", exps[f"mh{pid}"]],
            cwd=repo, env=dict(base_env),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    procs = [spawn(0), spawn(1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    assert "Multi-host: process 0/2" in outs[0]

    def trace(exp):
        path = os.path.join(exp, "run1", "metrics.jsonl")
        rows = [json.loads(l) for l in open(path)]
        return {r["step"]: r["value"] for r in rows
                if r["tag"] == "avg_q_loss/train"}

    t_single, t_mh = trace(exps["single"]), trace(exps["mh0"])
    assert sorted(t_single) == [4, 8, 12, 16, 20, 24]
    assert sorted(t_mh) == sorted(t_single)
    for step in t_single:
        np.testing.assert_allclose(
            t_mh[step], t_single[step], rtol=1e-4,
            err_msg=f"loss diverged at step {step}")

    # (b) primary-only side effects
    ckpts = sorted(os.listdir(os.path.join(exps["mh0"], "models")))
    assert ckpts == ["sample16.ckpt", "sample24.ckpt", "sample8.ckpt"]
    assert not os.path.exists(os.path.join(exps["mh1"], "models"))
    mh1_metrics = os.path.join(exps["mh1"], "run1", "metrics.jsonl")
    assert (not os.path.exists(mh1_metrics)
            or os.path.getsize(mh1_metrics) == 0)


# ---------------------------------------------------------------------------
# training stall watchdog (core/watchdog.py — the train-side twin of the
# eval --gather-timeout and bench VDQN_BENCH_WATCHDOG_S defenses)
# ---------------------------------------------------------------------------

def _wait_for(pred, deadline_s):
    end = time.monotonic() + deadline_s
    while time.monotonic() < end:
        if pred():
            return True
        time.sleep(0.05)
    return pred()


def test_stall_watchdog_fires_after_beats_cease():
    from video_dqn_tpu.core.watchdog import StallWatchdog

    fired = []
    # wide margin: 0.1 s beats against a 5 s deadline, so a single-core
    # scheduling stall cannot fire the watchdog during the healthy phase
    # (round-4 advisor flake finding)
    wd = StallWatchdog(5.0, first_timeout_s=5.0,
                       on_stall=lambda e: fired.append(e))
    try:
        for _ in range(10):          # healthy phase: beats inside deadline
            time.sleep(0.1)
            wd.beat()
        assert not fired
        assert _wait_for(lambda: fired, 30.0), "watchdog never fired"
        assert fired[0] >= 5.0       # elapsed reported honestly
    finally:
        wd.stop()


def test_stall_watchdog_first_deadline_grace():
    from video_dqn_tpu.core.watchdog import StallWatchdog

    fired = []
    # steady deadline 0.5 s but a 30 s cold-compile grace: silence before
    # the FIRST beat must not fire the steady deadline
    wd = StallWatchdog(0.5, first_timeout_s=30.0,
                       on_stall=lambda e: fired.append(e))
    try:
        time.sleep(1.5)
        assert not fired, "fired during first-beat grace"
        wd.beat()                    # enters steady state
        assert _wait_for(lambda: fired, 20.0), "steady deadline never fired"
    finally:
        wd.stop()


def test_stall_watchdog_stop_disarms():
    from video_dqn_tpu.core.watchdog import StallWatchdog

    fired = []
    wd = StallWatchdog(0.3, first_timeout_s=0.3,
                       on_stall=lambda e: fired.append(e))
    wd.stop()
    time.sleep(1.2)
    assert not fired
