"""Isolate the per-frame translation undershoot in the tracking chain.

Controlled experiment: a PERFECT map (ground-truth landmark positions,
ground-truth keyframe pose, rendered keyframe image) and a sequence of
rendered frames at known poses. Track each frame from a ground-truth
warm start and measure the estimated step against truth, per stage:

    direct   — photometric pose vs the keyframe templates
    refined  — align + PnP refinement on top of direct

If the undershoot appears here, the front-end is biased even under
ideal conditions; stage attribution tells where. Run on CPU:
    python tools/diag_track_bias.py [--scene corridor|room]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from viso_tpu.data import synthetic  # noqa: E402
from viso_tpu.geometry import camera as cam_mod  # noqa: E402
from viso_tpu.geometry import se3  # noqa: E402
from viso_tpu.ops import align, direct, pnp, pyramid  # noqa: E402
from viso_tpu.ops import fast  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--step", type=float, default=0.15)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    H, W = 184, 616
    fx = 718.856 / 2
    intr = cam_mod.Intrinsics.create(fx, fx, 607.1928 / 2, 185.2157 / 2)
    rng = np.random.default_rng(5)
    if args.scene == "corridor":
        scene = synthetic.corridor_scene(rng, tex_size=1024, far_z=90.0)
        Rs, ts = synthetic.forward_trajectory(
            args.frames + 1, step=args.step, yaw_rate=0.002
        )
    else:
        scene = synthetic.room_scene(rng, tex_size=768, half=5.5)
        Rs, ts = synthetic.orbit_trajectory(
            args.frames + 1, radius=2.5,
            total_angle=4 * np.pi * (args.frames + 1) / 500,
        )

    # Keyframe at GT pose with GT landmarks: detect features in the KF
    # image, unproject them to their TRUE depths via the renderer.
    kf_img, kf_depth = scene.render(intr, Rs[0], ts[0], H, W)
    kf_pyr = pyramid.build_pyramid(jnp.asarray(kf_img, jnp.float32), 4)
    uv, score, mask = fast.detect_grid(
        kf_pyr[0], threshold=8.0, grid=(4, 8), per_cell=32
    )
    uv_np = np.asarray(uv)
    z = np.asarray(kf_depth)[
        np.clip(uv_np[:, 1].astype(int), 0, H - 1),
        np.clip(uv_np[:, 0].astype(int), 0, W - 1),
    ]
    mask = np.asarray(mask) & (z > 0.1) & np.isfinite(z)
    x_n = np.asarray(cam_mod.normalize(uv, intr))
    p_cam = np.concatenate([x_n * z[:, None], z[:, None]], axis=-1)
    R0, t0 = np.asarray(Rs[0]), np.asarray(ts[0])
    pts_w = (p_cam - t0) @ R0  # R^T (p - t)
    pts_w = jnp.asarray(pts_w, jnp.float32)
    mask_j = jnp.asarray(mask)

    templates = direct.build_templates(
        kf_pyr, jnp.asarray(R0), jnp.asarray(t0), pts_w, mask_j, intr
    )
    obs_mask = jnp.asarray(mask)[None, :]

    print(
        f"# scene={args.scene} step={args.step} n_landmarks={mask.sum()}"
        f" iters={args.iters}"
    )
    print("frame  |t_gt|   direct:|t| ratio  refined:|t| ratio  rot_err(deg)")
    for k in range(1, args.frames + 1):
        img, _ = scene.render(intr, Rs[k], ts[k], H, W)
        pyr = pyramid.build_pyramid(jnp.asarray(img, jnp.float32), 4)
        # GT warm start = previous GT pose with CONSTANT-VELOCITY
        # prediction, like the engine: T_pred = (T_{k-1} T_{k-2}^-1) T_{k-1}
        Rp, tp = jnp.asarray(Rs[k - 1]), jnp.asarray(ts[k - 1])
        if k >= 2:
            dR, dt = se3.relative(
                jnp.asarray(Rs[k - 1]), jnp.asarray(ts[k - 1]),
                jnp.asarray(Rs[k - 2]), jnp.asarray(ts[k - 2]),
            )
            Rp, tp = se3.compose(dR, dt, Rp, tp)
        R_d, t_d, cost = direct.estimate_pose_templated(
            templates, pyr, pts_w, intr, Rp, tp,
            direct.DirectParams(iters=args.iters),
        )
        p_c = se3.transform(R_d, t_d, pts_w)
        uv_pred, depth = cam_mod.project(p_c, intr)
        visible = (
            mask_j & (depth > 0.1)
            & cam_mod.is_inside(uv_pred, H, W, border=8)
        )
        uv_ref = jnp.asarray(uv)
        kf_pyr_b = tuple(l[None] for l in kf_pyr)
        refined, err, ok = align.align(
            kf_pyr_b, jnp.zeros(pts_w.shape[0], jnp.int32), uv_ref,
            pyr, uv_pred, visible,
            align.AlignParams(iters=5),
        )
        x_ref = cam_mod.normalize(refined, intr)
        R_f, t_f = pnp.refine_pose(
            R_d, t_d, pts_w, x_ref, ok.astype(jnp.float32),
            huber=2.0 / fx, iters=4,
        )

        # Relative step from the keyframe (node 0): compare est vs gt.
        def step_of(Rx, tx):
            Rr, tr = se3.relative(
                jnp.asarray(Rx), jnp.asarray(tx),
                jnp.asarray(Rs[k - 1]), jnp.asarray(ts[k - 1]),
            )
            return np.linalg.norm(np.asarray(tr))

        gt_step = step_of(Rs[k], ts[k])
        d_step = step_of(R_d, t_d)
        f_step = step_of(R_f, t_f)
        ang = np.degrees(
            np.arccos(
                np.clip(
                    (np.trace(np.asarray(R_f) @ np.asarray(Rs[k]).T) - 1)
                    / 2, -1, 1,
                )
            )
        )
        print(
            f"{k:4d}  {gt_step:7.4f}  {d_step:7.4f} {d_step/gt_step:5.2f}"
            f"  {f_step:7.4f} {f_step/gt_step:5.2f}   {ang:6.3f}"
            f"   ok={int(ok.sum())}"
        )


if __name__ == "__main__":
    main()
