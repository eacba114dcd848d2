"""The video-bytes lifecycle, end to end: H.264 mp4s -> the five dataset
CLIs -> data.feather -> trained model -> model-scored SPL, exactly the
reference's README workflow (/root/reference/README.md:28-40) driven by
scripts/lifecycle_video_bytes.py as subprocess CLI calls.

Slow-marked: ~8-12 min on the 1-core CPU host (encode + decode + inverse
training + 12 DQN steps + 2 eval episodes at 96 px; 64 px would collapse
the extra_capacity head's feature map)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_video_bytes_lifecycle(tmp_path):
    from video_dqn_tpu.data import native_decode

    if not native_decode.available():
        pytest.skip("libvdecode unavailable")
    out = str(tmp_path / "lc")
    env = dict(os.environ)
    env.update(JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-u", "scripts/lifecycle_video_bytes.py",
         "--out", out, "--cpu", "--size", "96",
         "--videos", "2", "--video-steps", "40",
         "--steps", "12", "--batch", "16", "--episodes", "2",
         "--inverse-walks", "2", "--inverse-walk-steps", "40",
         "--inverse-steps", "12", "--inverse-batch", "16"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"{r.stdout[-4000:]}\n{r.stderr[-3000:]}"

    rows = {row["metric"]: row
            for row in json.load(open(os.path.join(out, "lifecycle_rows.json")))}
    # every stage produced a throughput/result row
    for metric in ["lifecycle_encode_frames_per_sec",
                   "lifecycle_extract_frames_per_sec",
                   "lifecycle_filter_frames_per_sec",
                   "lifecycle_inverse_val_accuracy",
                   "lifecycle_detect_stub_frames_per_sec",
                   "lifecycle_assemble_stub_rows_per_sec",
                   "lifecycle_assemble_oracle_rows_per_sec",
                   "lifecycle_train_frames_per_sec",
                   "lifecycle_model_spl",
                   "lifecycle_oracle_spl"]:
        assert metric in rows, f"{metric} missing: {sorted(rows)}"

    # real video bytes were written and consumed: mp4s exist, extraction
    # recovered every rendered frame (the row's assert would have tripped)
    vids = os.listdir(os.path.join(out, "dataset", "videos"))
    assert sorted(vids) == ["walk0000.mp4", "walk0001.mp4"]
    # both feather variants exist (stub = pure-CLI composition pass)
    assert os.path.exists(os.path.join(out, "dataset", "data.feather"))
    assert os.path.exists(os.path.join(out, "dataset", "data_stub.feather"))
    # the oracle-detections variant carried reward signal into assembly
    assert rows["lifecycle_assemble_oracle_rows_per_sec"]["reward_ratio"] > 0
    # SPL rows are valid SPLs
    assert 0.0 <= rows["lifecycle_model_spl"]["value"] <= 1.0
    assert rows["lifecycle_oracle_spl"]["value"] > 0.0
