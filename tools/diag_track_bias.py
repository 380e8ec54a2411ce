"""Isolate the per-frame yaw bias: oracle-depth vs stereo-depth landmarks.

Renders keyframe k and frames k+1..k+G of the orbit bench sequence,
builds landmarks either from exact renderer depth (oracle) or from the
stereo matcher (pipeline), then runs the SAME track stages the engine
runs (direct templated + align + PnP refine) starting from the GT pose
of the previous frame (perfect warm start — no motion-model error).
Reports per-stage signed yaw error per frame.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    import tempfile

    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        tempfile.gettempdir(), f"viso_jax_cache_{os.getuid()}"
    )
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def yaw_err(R_est, R_gt):
    E = np.asarray(R_est) @ np.asarray(R_gt).T
    w = np.array([E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]])
    return 0.5 * w[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100, help="keyframe index")
    ap.add_argument("--gap", type=int, default=6)
    ap.add_argument("--depth", choices=["oracle", "stereo"], default="oracle")
    ap.add_argument("--features", type=int, default=256)
    ap.add_argument("--fast-threshold", type=float, default=6.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from viso_tpu.data import synthetic
    from viso_tpu.geometry import camera as cam_mod, se3
    from viso_tpu.ops import align, direct, fast, pnp, pyramid, stereo

    H, W = 184, 616
    intr = cam_mod.Intrinsics.create(
        bench.KITTI_FULL["fx"] / 2, bench.KITTI_FULL["fy"] / 2,
        bench.KITTI_FULL["cx"] / 2, bench.KITTI_FULL["cy"] / 2,
    )
    rng = np.random.default_rng(11)
    scene = synthetic.room_scene(rng, tex_size=768, half=5.5)
    Rs, ts = synthetic.orbit_trajectory(500, radius=2.5, total_angle=4 * np.pi)

    k = args.k
    il, ir, depth_l = synthetic.make_stereo_pair(
        scene, intr, Rs[k], ts[k], H, W, baseline=0.537
    )
    pyr_kf = pyramid.build_pyramid(jnp.asarray(il, jnp.float32), 4)

    uv, score, mask = fast.detect_grid(
        pyr_kf[0], threshold=args.fast_threshold, grid=(4, 8),
        per_cell=max(1, args.features // 32),
    )
    uv_np = np.asarray(uv)
    if args.depth == "oracle":
        z = scene.depth_at(intr, Rs[k], ts[k], uv_np).astype(np.float32)
        ok_z = np.isfinite(z) & (z > 0.5) & (z < 80.0) & np.asarray(mask)
        z = np.where(ok_z, z, 0.0)
    else:
        disp, cost, ok_d = stereo.match(
            jnp.asarray(il, jnp.float32), jnp.asarray(ir, jnp.float32),
            uv, mask, stereo.StereoParams(max_disparity=96),
        )
        z = np.asarray(
            stereo.disparity_to_depth(disp, intr.fx, 0.537, ok_d)
        )
        ok_z = np.asarray(ok_d) & (z > 0.5) & (z < 80.0)
    p_cam = np.asarray(cam_mod.backproject(uv, jnp.asarray(z), intr))
    R_inv, t_inv = se3.inverse(jnp.asarray(Rs[k]), jnp.asarray(ts[k]))
    p_world = np.asarray(se3.transform(R_inv, t_inv, jnp.asarray(p_cam)))
    pts = jnp.asarray(np.where(ok_z[:, None], p_world, 0.0))
    pmask = jnp.asarray(ok_z)
    print(f"landmarks: {int(ok_z.sum())} / {len(uv_np)}", file=sys.stderr)

    templates = direct.build_templates(
        pyr_kf, jnp.asarray(Rs[k]), jnp.asarray(ts[k]), pts, pmask, intr
    )

    # Track frames k+1..k+gap with perfect warm start (GT of prev frame).
    rows = []
    # Keyframe observations for align's reference (obs in KF).
    for g in range(1, args.gap + 1):
        i = k + g
        img, _, _ = synthetic.make_stereo_pair(
            scene, intr, Rs[i], ts[i], H, W, baseline=0.537
        )
        pyr = pyramid.build_pyramid(jnp.asarray(img, jnp.float32), 4)
        R0, t0 = jnp.asarray(Rs[i - 1]), jnp.asarray(ts[i - 1])
        R_d, t_d, cost = direct.estimate_pose_templated(
            templates, pyr, pts, intr, R0, t0
        )
        # Align stage: reference = the keyframe (mirror the engine's
        # single-KF case), uv_ref = projection of pts into KF.
        uv_ref, d_ref = cam_mod.project(
            se3.transform(jnp.asarray(Rs[k]), jnp.asarray(ts[k]), pts), intr
        )
        p_cam_d = se3.transform(R_d, t_d, pts)
        uv_pred, dep = cam_mod.project(p_cam_d, intr)
        visible = (
            pmask & (dep > 0.1) & cam_mod.is_inside(uv_pred, H, W, border=8)
        )
        kf_pyr_stack = tuple(
            jnp.broadcast_to(l[None], (1,) + l.shape) for l in pyr_kf
        )
        k_idx = jnp.zeros(pts.shape[0], jnp.int32)
        refined, err, ok_a = align.align(
            kf_pyr_stack, k_idx, uv_ref, pyr, uv_pred, visible
        )
        x_ref = cam_mod.normalize(refined, intr)
        R_f, t_f = pnp.refine_pose(
            R_d, t_d, pts, x_ref, ok_a.astype(jnp.float32),
            huber=2.0 / intr.fx, iters=4,
        )
        gt_dyaw = 4 * np.pi / 499
        rows.append(
            dict(
                frame=i,
                n_align=int(np.asarray(ok_a).sum()),
                yaw_direct=round(float(yaw_err(R_d, Rs[i])), 5),
                yaw_refined=round(float(yaw_err(R_f, Rs[i])), 5),
                t_err_direct=round(
                    float(np.linalg.norm(np.asarray(t_d) - ts[i])), 4
                ),
                t_err_refined=round(
                    float(np.linalg.norm(np.asarray(t_f) - ts[i])), 4
                ),
                gt_dyaw=round(gt_dyaw, 5),
            )
        )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
