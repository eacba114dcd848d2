import time

import jax.numpy as jnp
import numpy as np

from video_dqn_tpu.core import (
    DiskLogger,
    DiskReader,
    MetricsWriter,
    latest_checkpoint_step,
    read_metrics,
    restore_checkpoint,
    save_checkpoint,
)


def test_disk_logger_roundtrip(tmp_path):
    log = DiskLogger(str(tmp_path / "results"))
    log.write(0, {"spl": 0.5})
    log.write(1, {"spl": 1.0})
    log.write(0, {"spl": 0.7})  # overwrite
    data = DiskReader(str(tmp_path / "results")).data()
    assert data[0]["spl"] == 0.7
    assert data[1]["spl"] == 1.0


def test_disk_logger_shard_rotation_merge(tmp_path):
    folder = str(tmp_path / "results")
    log = DiskLogger(folder, checkpoint_time=0.01)
    log.write(0, "a")
    time.sleep(0.02)
    log.write(1, "b")  # rotated into new shard
    merged = DiskReader(folder).data()
    assert merged == {0: "a", 1: "b"}


def test_disk_logger_multiprocess_merge(tmp_path):
    folder = str(tmp_path / "results")
    l1 = DiskLogger(folder)
    l2 = DiskLogger(folder)
    l1.write("ep0", 1)
    time.sleep(0.01)
    l2.write("ep1", 2)
    assert DiskReader(folder).data() == {"ep0": 1, "ep1": 2}


def test_checkpoint_save_restore_resume(tmp_path):
    models = str(tmp_path / "models")
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "opt_state": {"mu": np.ones(3, np.float32)},
    }
    save_checkpoint(models, 2000, tree)
    save_checkpoint(models, 4000, tree)
    assert latest_checkpoint_step(models) == 4000

    template = {
        "params": {"w": jnp.zeros((2, 3)), "b": jnp.ones(3)},
        "opt_state": {"mu": np.zeros(3, np.float32)},
    }
    restored = restore_checkpoint(models, 2000, template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), tree["params"]["w"])
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]), np.ones(3))


def test_latest_checkpoint_none(tmp_path):
    assert latest_checkpoint_step(str(tmp_path / "nope")) is None


def test_metrics_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path / "run1"), tensorboard=False)
    w.add_scalar("loss/train", 0.5, 100)
    w.add_scalar("loss/train", 0.25, 200)
    w.add_scalar("other", 9.0, 100)
    w.flush()
    recs = read_metrics(str(tmp_path / "run1"), "loss/train")
    assert [r["value"] for r in recs] == [0.5, 0.25]
    assert [r["step"] for r in recs] == [100, 200]
