"""End-to-end VO integration tests on synthetic rendered sequences."""

import numpy as np
import pytest

from viso_tpu.data import synthetic
from viso_tpu.geometry import camera
from viso_tpu.slam.engine import MonocularVO, StereoVO, VOConfig
from viso_tpu.utils import metrics

H, W = 192, 256
INTR = dict(fx=200.0, fy=200.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)


def small_config(**kw):
    base = dict(
        height=H,
        width=W,
        max_keyframes=6,
        max_landmarks=384,
        num_features=192,
        detect_grid=(4, 6),
        fast_threshold=15.0,
        baseline=0.3,
        max_disparity=48,
        kf_min_gap=2,
        **INTR,
    )
    base.update(kw)
    return VOConfig(**base)


@pytest.fixture(scope="module")
def corridor():
    rng = np.random.default_rng(7)
    return synthetic.corridor_scene(rng, tex_size=512)


def render_forward(corridor, n_frames, step=0.25, stereo=False, baseline=0.3):
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.forward_trajectory(n_frames, step=step, yaw_rate=0.004)
    frames = []
    for R, t in zip(Rs, ts):
        if stereo:
            il, ir, _ = synthetic.make_stereo_pair(
                corridor, intr, R, t, H, W, baseline=baseline
            )
            frames.append((il, ir))
        else:
            img, _ = corridor.render(intr, R, t, H, W)
            frames.append(img)
    return frames, (Rs, ts)


def test_stereo_vo_tracks_trajectory(corridor):
    n = 12
    frames, (Rs, ts) = render_forward(corridor, n, stereo=True)
    vo = StereoVO(small_config())
    for il, ir in frames:
        vo.process(il, ir)
    R_est, t_est = vo.trajectory()
    assert len(R_est) == n
    # Stereo has metric scale: no scale alignment allowed.
    c_est = metrics.camera_centers(R_est, t_est)
    c_gt = metrics.camera_centers(Rs, ts)
    ate = metrics.ate_rmse(c_est, c_gt, align=True, with_scale=False)
    # Total travel is ~2.75 m; demand cm-level tracking.
    assert ate < 0.05, (ate, c_est[-1], c_gt[-1])
    # Scale check: estimated travel distance within 5%.
    d_est = np.linalg.norm(c_est[-1] - c_est[0])
    d_gt = np.linalg.norm(c_gt[-1] - c_gt[0])
    assert abs(d_est / d_gt - 1.0) < 0.05
    tracked = [r.num_tracked for r in vo.results[1:]]
    assert min(tracked) > 30


def test_stereo_vo_photometric_backend(corridor):
    # The reference's stated backend intent: window BA on 16-dim 4x4-patch
    # photometric residuals (bundle_adjuster.h:58-106) instead of
    # reprojection. Same pipeline must still track metrically.
    n = 12
    frames, (Rs, ts) = render_forward(corridor, n, stereo=True)
    vo = StereoVO(small_config(ba_backend="photometric", photo_ba_level=1))
    for il, ir in frames:
        vo.process(il, ir)
    R_est, t_est = vo.trajectory()
    c_est = metrics.camera_centers(R_est, t_est)
    c_gt = metrics.camera_centers(Rs, ts)
    ate = metrics.ate_rmse(c_est, c_gt, align=True, with_scale=False)
    assert ate < 0.08, ate
    d_est = np.linalg.norm(c_est[-1] - c_est[0])
    d_gt = np.linalg.norm(c_gt[-1] - c_gt[0])
    assert abs(d_est / d_gt - 1.0) < 0.08


def test_stereo_vo_keyframes_and_landmarks(corridor):
    frames, _ = render_forward(corridor, 8, stereo=True)
    vo = StereoVO(small_config())
    for il, ir in frames:
        vo.process(il, ir)
    assert int(vo.map.num_points) > 50
    assert len(vo.kf_order) >= 1
    assert vo.results[0].is_keyframe


def test_monocular_vo_initializes_and_tracks(corridor):
    n = 14
    frames, (Rs, ts) = render_forward(corridor, n, step=0.3)
    # Forward motion produces small radial flow; the reference's 15 px
    # disparity gate (viso.h:24) is tuned for lateral motion, so lower it.
    vo = MonocularVO(small_config(min_init_tracks=40, disparity_squared_thresh=25.0))
    for img in frames:
        vo.process(img)
    states = [r.state for r in vo.results]
    assert "tracking" in states, states
    first_track = states.index("tracking")
    assert first_track <= 6
    # Compare aligned (scale-free) trajectories over tracked frames.
    R_est, t_est = vo.trajectory()
    c_est = metrics.camera_centers(R_est[first_track:], t_est[first_track:])
    c_gt = metrics.camera_centers(Rs[first_track:], ts[first_track:])
    ate = metrics.ate_rmse(c_est, c_gt, align=True, with_scale=True)
    travel = np.linalg.norm(c_gt[-1] - c_gt[0])
    assert ate < 0.08 * travel, (ate, travel)
