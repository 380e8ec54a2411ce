"""Tests for metrics, checkpoint/resume, and logging."""

import os

import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import se3
from viso_tpu.mapping import map_state
from viso_tpu.utils import checkpoint, logging as vlog, metrics


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(50, 3))
    s_true = 2.3
    R_true = np.asarray(se3.so3_exp(jnp.array([0.2, -0.4, 0.1])))
    t_true = np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = metrics.umeyama_alignment(src, dst)
    assert abs(s - s_true) < 1e-6
    assert np.allclose(R, R_true, atol=1e-6)
    assert np.allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_identical(rng):
    traj = rng.normal(size=(30, 3))
    assert metrics.ate_rmse(traj, traj) < 1e-9
    # Scaled/rotated copy aligns to ~zero with scale alignment.
    R = np.asarray(se3.so3_exp(jnp.array([0.1, 0.2, 0.3])))
    traj2 = 0.5 * traj @ R.T + np.array([1, 2, 3.0])
    assert metrics.ate_rmse(traj, traj2, with_scale=True) < 1e-6


def test_rpe_detects_relative_drift(rng):
    n = 20
    R_gt = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    t_gt = np.stack([np.array([0, 0, 0.1 * k], np.float32) for k in range(n)])
    # Estimated: same but each step 10% longer.
    t_est = t_gt * 1.1
    trans_rmse, rot_rmse = metrics.rpe(R_gt, t_est, R_gt, t_gt, delta=1)
    assert abs(trans_rmse - 0.01) < 1e-6
    assert rot_rmse < 1e-6


def test_map_checkpoint_roundtrip(tmp_path, rng):
    m = map_state.empty(4, 32, (64, 96), 3)
    m = map_state.insert_keyframe(
        m, 1, jnp.eye(3), jnp.array([1.0, 2.0, 3.0]), 7,
        tuple(jnp.full((64 // 2**l, 96 // 2**l), float(l)) for l in range(3)),
    )
    pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    m, slots, ok = map_state.allocate_landmarks(m, pts, jnp.ones(5, bool))
    m = map_state.set_observations(
        m, 1, slots, jnp.zeros((5, 2)) + 10.0, ok
    )
    path = os.path.join(tmp_path, "map.npz")
    checkpoint.save_map(path, m, extra={"frame": 7})
    m2, extra = checkpoint.load_map(path)
    assert extra["frame"] == 7
    for a, b in zip(m, m2):
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                assert np.array_equal(np.asarray(x), np.asarray(y))
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_trajectory_checkpoint_roundtrip(tmp_path, rng):
    n = 11
    R = np.stack([np.asarray(se3.so3_exp(jnp.array(rng.normal(size=3) * 0.3))) for _ in range(n)]).astype(np.float32)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "traj.txt")
    checkpoint.save_trajectory(path, R, t)
    R2, t2 = checkpoint.load_trajectory(path)
    assert np.allclose(R, R2, atol=1e-5)
    assert np.allclose(t, t2, atol=1e-5)


def test_run_logger(tmp_path):
    path = os.path.join(tmp_path, "log.jsonl")
    log = vlog.RunLogger(path=path)
    log.tick()
    for k in range(5):
        log.log_frame(k, num_tracked=10 + k, state="tracking")
    log.close()
    assert log.summary()["frames"] == 5
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 5
    import json

    rec = json.loads(lines[3])
    assert rec["tracked"] == 13


def test_export_map_html(tmp_path, rng):
    from viso_tpu.utils import viz

    pts = rng.normal(0, 3, (64, 3)).astype(np.float32)
    mask = np.ones(64, bool)
    mask[50:] = False
    traj = np.cumsum(rng.normal(0, 0.1, (20, 3)), axis=0).astype(np.float32)
    path = str(tmp_path / "map.html")
    viz.export_map_html(pts, mask, traj, path)
    html = open(path).read()
    assert html.startswith("<!doctype html>")
    assert "const POINTS" in html and "const TRAJ" in html
    # Only masked-in landmarks embedded.
    import json as _json

    start = html.index("const POINTS = ") + len("const POINTS = ")
    end = html.index(";\n", start)
    assert len(_json.loads(html[start:end])) == 50


def test_debug_finite_state_audit():
    """check_finite_state flags exactly the poisoned field."""
    import jax.numpy as jnp

    from viso_tpu.slam.engine import StereoVO, VOConfig
    from viso_tpu.utils import debug

    cfg = VOConfig(
        height=64, width=96, max_keyframes=2, max_landmarks=32,
        num_features=16, detect_grid=(2, 2), fx=100.0, fy=100.0,
        cx=47.5, cy=31.5,
    )
    vo = StereoVO(cfg)
    assert debug.check_finite_state(vo) == []
    vo.map = vo.map._replace(
        points=vo.map.points.at[3, 1].set(jnp.nan)
    )
    bad = debug.check_finite_state(vo)
    assert bad == ["map.points"], bad
    vo.close()
    debug.assert_no_donation()
