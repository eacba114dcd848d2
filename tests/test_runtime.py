"""Runtime plumbing tests: host->HBM prefetcher and the profiling timer."""

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
