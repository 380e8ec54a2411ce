"""Diagnose the mono Sim(3) scale-seam under-measurement (VERDICT r4 #1).

Reruns the test_mono_slam_closes_loop scenario and records, per pose-graph
node, the REALIZED local scale (estimated inter-node camera-center distance
over ground-truth distance). That splits the failure into:
  (a) the engineered 1.5x seam is not realized by the engine, vs
  (b) the seam is realized but the masked-Umeyama loop edge under-measures it.
Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/diag_mono_seam.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

from viso_tpu.data import synthetic
from viso_tpu.geometry import camera
from viso_tpu.slam.engine import VOConfig as _VOConfig
from viso_tpu.slam.loop_closure import LoopParams
from viso_tpu.slam.mono_full import MonoSLAM
from viso_tpu.utils import metrics

H, W = 160, 224
INTR = dict(fx=180.0, fy=180.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5)


def main():
    n = 120
    room = synthetic.room_scene(np.random.default_rng(11), tex_size=512, half=6.0)
    intr = camera.Intrinsics.create(**INTR)
    Rs, ts = synthetic.orbit_trajectory(n, radius=2.0, total_angle=2.4 * np.pi)
    frames = [room.render(intr, R, t, H, W)[0] for R, t in zip(Rs, ts)]
    noise_rng = np.random.default_rng(3)
    for i in range(46, 58):
        frames[i] = noise_rng.uniform(0, 255, frames[i].shape).astype(np.float32)

    class SeamMonoSLAM(MonoSLAM):
        def _recent_speed(self):
            s = super()._recent_speed()
            return None if s is None else 1.5 * s

        def _map_median_depth(self):
            d = super()._map_median_depth()
            return None if d is None else 1.5 * d

        def _try_initialize(self, pyr):
            # --wait-N: refuse to accept a re-init bootstrap until the
            # ref->cur gap reaches N frames (parallax accumulation test).
            ir = self.init_ref
            wait = next(
                (int(a.rsplit("-", 1)[1]) for a in sys.argv
                 if a.startswith("--wait-")), 0,
            )
            if (
                wait and ir is not None and self.num_reinits > 0
                and (self.frame_idx - ir[-1]) < wait
            ):
                return
            super()._try_initialize(pyr)

    cfg = _VOConfig(
        height=H, width=W, max_keyframes=6, max_landmarks=768,
        num_features=192, detect_grid=(4, 6), fast_threshold=10.0,
        kf_min_gap=1, kf_max_gap=3, kf_min_visible_frac=0.6,
        min_init_tracks=25, disparity_squared_thresh=25.0,
        run_ba="--no-ba" not in sys.argv,
        direct_iters=12 if "--hi-iters" in sys.argv else 6,
        align_iters=10 if "--hi-iters" in sys.argv else 5,
        **INTR,
    )
    lp = LoopParams(
        capacity=64, num_features=128, guard=8, min_matches=25,
        min_inliers=15, max_correction_m=6.0, max_correction_rad=2.5,
    )
    os.environ["VISO_LOOP_DEBUG"] = "1"
    slam = SeamMonoSLAM(cfg, lp)
    for img in frames:
        slam.process(img)
    slam.join()
    print("hook_errors:", slam.hook_errors)
    print("num_reinits:", slam.num_reinits)

    # Per-frame: state, tracked count, step scale est/gt.
    from viso_tpu.slam.engine import _pull_poses

    Rf, tf = _pull_poses(slam.results)
    cf_est = metrics.camera_centers(Rf, tf)
    cf_gt = metrics.camera_centers(Rs[: len(Rf)], ts[: len(Rf)])
    df_est = np.linalg.norm(np.diff(cf_est, axis=0), axis=-1)
    df_gt = np.linalg.norm(np.diff(cf_gt, axis=0), axis=-1)
    print("\nframe  state     tracked  kf  step_scale")
    for i, r in enumerate(slam.results):
        sc = df_est[i - 1] / max(df_gt[i - 1], 1e-9) if i > 0 else 0.0
        print(
            f"{i:5d}  {r.state:9s} {r.num_tracked:6d}  "
            f"{'K' if r.is_keyframe else ' '}  {sc:8.3f}"
        )

    # Realized per-node scale: est inter-node step / GT inter-node step,
    # from RAW odometry poses (the measurement frame loop edges use).
    raw_R = np.stack(slam.pg_raw_R)
    raw_t = np.stack(slam.pg_raw_t)
    fr = np.asarray(slam.pg_frame)
    c_est = metrics.camera_centers(raw_R, raw_t)
    c_gt = metrics.camera_centers(Rs[fr], ts[fr])
    d_est = np.linalg.norm(np.diff(c_est, axis=0), axis=-1)
    d_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=-1)
    scale = d_est / np.maximum(d_gt, 1e-9)
    print("\nnode  frame  step_scale (est/gt)")
    for k in range(len(d_est)):
        print(f"{k+1:4d}  {fr[k+1]:5d}  {scale[k]:7.3f}")

    print("\nloops:")
    for lo in slam.loops:
        i, j = lo["to"], lo["from"]
        # local realized scale near each endpoint (median of +-2 steps)
        def loc(k):
            lo_i = max(0, k - 2)
            hi_i = min(len(scale), k + 2)
            return float(np.median(scale[lo_i:hi_i]))
        print(
            f"  {j}(f{fr[j]}, loc_scale {loc(j):.3f}) -> {i}(f{fr[i]}, "
            f"loc_scale {loc(i):.3f})  s_rel={lo['s_rel']:.4f} "
            f"expected~{loc(i)/loc(j):.4f}  inliers={lo['inliers']}"
        )
    print("\npg_s (solved node scales):", np.round(np.asarray(slam.pg_s), 3))
    slam.close()


if __name__ == "__main__":
    main()
