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


def test_photo_ba_anchor_survives_eviction(rng):
    """Anchor keyframes are chosen per-call from the live obs grid: when
    a landmark's anchor (oldest observing) keyframe is evicted
    mid-window, the template must re-anchor to the next-oldest observer
    and BA must still run and reduce cost (engine._run_window_ba
    rebuilds the problem from map state every keyframe)."""
    from viso_tpu.mapping import map_state
    from viso_tpu.ops import pyramid

    H, W = 120, 160
    intr = camera.Intrinsics.create(150.0, 150.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.PlaneScene()
    scene.planes = [
        synthetic.frontal_plane(
            synthetic.smooth_texture(rng, 768, 768), z=8.0, tex_scale=60.0
        )
    ]
    K, L, C = 4, 64, 3
    Rs = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    ts = np.stack(
        [np.array([-0.3 * c, 0.0, 0.0], np.float32) for c in range(C)]
    )
    m = map_state.empty(K, L, (H, W), 4)
    for c in range(C):
        img, _ = scene.render(intr, Rs[c], ts[c], H, W)
        pyr = pyramid.build_pyramid(jnp.asarray(img), 4)
        m = map_state.insert_keyframe(
            m, c, jnp.array(Rs[c]), jnp.array(ts[c]), c * 10, pyr
        )
    uv0 = np.stack(
        [rng.uniform(12, W - 12, L), rng.uniform(12, H - 12, L)], -1
    ).astype(np.float32)
    depth = scene.depth_at(intr, Rs[0], ts[0], uv0).astype(np.float32)
    good = np.isfinite(depth)
    p_cam = camera.backproject(jnp.array(uv0), jnp.array(depth), intr)
    R0i, t0i = se3.inverse(jnp.array(Rs[0]), jnp.array(ts[0]))
    pts_w = se3.transform(R0i, t0i, p_cam)
    m, slots, ok = map_state.allocate_landmarks(m, pts_w, jnp.array(good))
    # Observations in every keyframe (exact projections).
    for c in range(C):
        pc = se3.transform(jnp.array(Rs[c]), jnp.array(ts[c]), m.points)
        uv, d = camera.project(pc, intr)
        vis = ok & (d > 0.1) & camera.is_inside(uv, H, W, border=10)
        m = map_state.set_observations(m, c, slots, uv, vis)

    prob, intr_l = map_state.as_photo_ba_problem(m, intr, level=1)
    anchors_before = np.asarray(prob.anchor_idx)[np.asarray(m.point_mask)]
    assert (anchors_before == 0).all()  # oldest observer is KF 0

    # Evict the anchor keyframe.
    m2 = map_state.evict_keyframe(m, 0)
    prob2, _ = map_state.as_photo_ba_problem(m2, intr, level=1)
    alive = np.asarray(m2.point_mask)
    assert alive.sum() > 20  # still observed by KFs 1 and 2
    anchors_after = np.asarray(prob2.anchor_idx)[alive]
    assert (anchors_after == 1).all()  # re-anchored to next-oldest

    # BA on the post-eviction window still optimizes.
    R_pert = np.asarray(m2.kf_R).copy()
    t_pert = np.asarray(m2.kf_t).copy()
    dR, dt = se3.se3_exp(jnp.array([0.004, -0.003, 0.002, 0.001, -0.002, 0.001]))
    R_pert[2] = np.asarray(dR) @ R_pert[2]
    t_pert[2] = np.asarray(dR) @ t_pert[2] + np.asarray(dt)
    m2 = m2._replace(kf_R=jnp.array(R_pert), kf_t=jnp.array(t_pert))
    prob3, intr_l = map_state.as_photo_ba_problem(m2, intr, level=1)
    prob3 = prob3._replace(
        cam_fixed=jnp.array([False, True, False, True])  # gauge: KF 1
    )
    out, info = pba.solve(prob3, intr_l, pba.PhotoBAParams(iters=10, num_fixed=0))
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.7
    dR_fin = np.asarray(out.R)[2] @ Rs[2].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR_fin) - 1) / 2, -1, 1)))
    assert ang < 0.15, ang
