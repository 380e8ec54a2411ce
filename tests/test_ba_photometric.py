"""Photometric BA: recover pose/point perturbations on rendered images."""

import jax.numpy as jnp
import numpy as np

from viso_tpu.backend import ba_photometric as pba
from viso_tpu.data import synthetic
from viso_tpu.geometry import camera, se3


def test_photometric_ba_recovers_poses(rng):
    # Fronto-parallel plane + lateral motion: patch warp ~ identity, so
    # the photometric optimum coincides with the geometric truth (oblique
    # scenes foreshorten the patches and bias the optimum — affine patch
    # warps would be needed there).
    H, W = 120, 160
    intr = camera.Intrinsics.create(150.0, 150.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.PlaneScene()
    scene.planes = [
        synthetic.frontal_plane(
            synthetic.smooth_texture(rng, 768, 768), z=8.0, tex_scale=60.0
        )
    ]
    C, L = 4, 96
    Rs = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    ts = np.stack(
        [np.array([-0.25 * c, 0.05 * c, 0.0], np.float32) for c in range(C)]
    )
    images = np.stack(
        [scene.render(intr, Rs[c], ts[c], H, W)[0] for c in range(C)]
    )
    # Landmarks: sample pixels in keyframe 0, backproject with exact depth.
    uv0 = np.stack(
        [rng.uniform(10, W - 10, L), rng.uniform(10, H - 10, L)], -1
    ).astype(np.float32)
    depth = scene.depth_at(intr, Rs[0], ts[0], uv0).astype(np.float32)
    good = np.isfinite(depth)
    p_cam = np.asarray(camera.backproject(jnp.array(uv0), jnp.array(depth), intr))
    R0_inv, t0_inv = se3.inverse(jnp.array(Rs[0]), jnp.array(ts[0]))
    pts_w = np.asarray(se3.transform(R0_inv, t0_inv, jnp.array(p_cam)))

    anchor = np.zeros(L, np.int32)
    template = pba.make_template(
        jnp.array(images), jnp.array(anchor), jnp.array(pts_w),
        jnp.array(Rs), jnp.array(ts), intr,
    )
    # Perturb cameras 1..3 and the points slightly.
    R_pert, t_pert = Rs.copy(), ts.copy()
    for c in range(2, C):
        dR, dt = se3.se3_exp(jnp.array(rng.normal(0, 0.004, 6).astype(np.float32)))
        R_pert[c] = np.asarray(dR) @ R_pert[c]
        t_pert[c] = np.asarray(dR) @ t_pert[c] + np.asarray(dt)
    pts_pert = pts_w + rng.normal(0, 0.01, pts_w.shape).astype(np.float32)

    prob = pba.PhotoBAProblem(
        R=jnp.array(R_pert),
        t=jnp.array(t_pert),
        points=jnp.array(pts_pert),
        images=jnp.array(images),
        template=template,
        anchor_idx=jnp.array(anchor),
        obs_mask=jnp.ones((C, L), bool) & jnp.array(good)[None, :],
        cam_mask=jnp.ones(C, bool),
        point_mask=jnp.array(good),
    )
    # Two fixed cameras: with one, the global scale gauge (scene + camera
    # translations co-scaling about the fixed center) is unobservable.
    params = pba.PhotoBAParams(iters=16, num_fixed=2)
    out, info = pba.solve(prob, intr, params)
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.5
    for c in range(2, C):
        dR = np.asarray(out.R)[c] @ Rs[c].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        ang0 = np.degrees(
            np.arccos(
                np.clip((np.trace(R_pert[c] @ Rs[c].T) - 1) / 2, -1, 1)
            )
        )
        assert ang < max(0.35 * ang0, 0.02), (c, ang, ang0)
        t_err = np.linalg.norm(np.asarray(out.t)[c] - ts[c])
        t_err0 = np.linalg.norm(t_pert[c] - ts[c])
        # The depth-direction translation component is weakly observable
        # against a fronto-parallel plane; demand a solid but not
        # unrealistic contraction.
        assert t_err < max(0.65 * t_err0, 0.004), (c, t_err, t_err0)
