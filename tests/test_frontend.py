"""Tests for pyramid, FAST detection, LK flow, and direct tracking on
synthetic images with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import camera, se3
from viso_tpu.ops import direct, fast, lk, pyramid


def checkerboard(h, w, sq=8, lo=40.0, hi=210.0):
    vs, us = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = (((vs // sq) + (us // sq)) % 2).astype(np.float32)
    return lo + (hi - lo) * board


def smooth_texture(rng, h, w, octaves=4):
    """Random smooth texture with plenty of gradient information."""
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        s = 2**o
        base = rng.uniform(0, 1, size=(h // (4 * s) + 2, w // (4 * s) + 2))
        from scipy.ndimage import zoom

        z = zoom(base, ((h / base.shape[0]), (w / base.shape[1])), order=3)
        img += z[:h, :w] * (2.0**o)
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img.astype(np.float32)


def test_pyramid_shapes_and_content():
    img = jnp.array(checkerboard(64, 96))
    pyr = pyramid.build_pyramid(img)
    assert len(pyr) == 4
    assert pyr[0].shape == (64, 96)
    assert pyr[1].shape == (32, 48)
    assert pyr[3].shape == (8, 12)
    # Downsampled mean should be preserved by the Gaussian kernel.
    assert abs(float(jnp.mean(pyr[1])) - float(jnp.mean(img))) < 5.0


def squares_image(rng, h=128, w=128, n_sq=12):
    """Isolated bright squares on dark background: unambiguous L-corners.

    (Checkerboard X-crossings are *not* FAST corners — no 9-contiguous
    arc — so we test on the canonical uniform-region corner pattern.)
    """
    img = np.full((h, w), 30.0, np.float32)
    for _ in range(n_sq):
        r = int(rng.integers(8, h - 24))
        c = int(rng.integers(8, w - 24))
        img[r : r + 14, c : c + 14] = 220.0
    # Slight noise breaks score ties; perfectly flat synthetic edges make
    # strict-NMS implementations (like OpenCV's) suppress everything.
    img += rng.normal(0.0, 2.0, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


def test_fast_matches_opencv(rng):
    import cv2

    img = squares_image(rng)
    uv, score, mask = fast.detect(jnp.array(img), threshold=40.0, max_num=512)
    ours = np.asarray(uv)[np.asarray(mask)]
    det = cv2.FastFeatureDetector_create(
        threshold=40, nonmaxSuppression=True, type=cv2.FastFeatureDetector_TYPE_9_16
    )
    kps = det.detect(img.astype(np.uint8), None)
    cv_pts = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    assert len(ours) > 0 and len(cv_pts) > 0
    # Every OpenCV corner should have one of ours within 2 px and vice versa
    # (NMS tie-breaking can shift positions by a pixel).
    d = np.linalg.norm(ours[:, None, :] - cv_pts[None, :, :], axis=-1)
    assert (d.min(axis=0) <= 2.0).mean() > 0.9
    # Our tie-keeping NMS (>= vs strict >) admits a few extra detections
    # near flat-edge ties; 75% agreement on the reverse direction is the
    # realistic bound on synthetic imagery.
    assert (d.min(axis=1) <= 2.0).mean() > 0.75


def test_fast_grid_distribution(rng):
    img = jnp.array(smooth_texture(rng, 128, 128))
    uv, score, mask = fast.detect_grid(img, threshold=5.0, grid=(4, 4), per_cell=8)
    assert uv.shape == (128, 2)
    pts = np.asarray(uv)[np.asarray(mask)]
    if len(pts) > 16:
        # Detections should cover at least 3 of the 4 column bands.
        bands = np.unique((pts[:, 0] // 32).astype(int))
        assert len(bands) >= 3


def test_detect_grid_pyramid_fills_from_coarse_levels(rng):
    """Level-0-invisible (blurred) structure must still be detected via
    coarser pyramid levels — the failure mode that starved tracking in
    the close-wall sectors of the orbit benchmark (0 corners at level 0,
    150+ at level 2)."""
    from scipy.ndimage import gaussian_filter

    img = squares_image(rng, 128, 128)
    blurred = gaussian_filter(img, sigma=4.0)
    pyr = pyramid.build_pyramid(jnp.array(blurred), 4)
    # Single-scale detection finds (almost) nothing on the blurred image.
    _, _, m0 = fast.detect_grid(pyr[0], threshold=20.0, grid=(4, 4), per_cell=8)
    # Multi-scale fills the budget from coarse levels.
    uv, score, m = fast.detect_grid_pyramid(
        pyr, threshold=20.0, grid=(4, 4), per_cell=8, levels=3
    )
    assert int(np.asarray(m).sum()) > int(np.asarray(m0).sum())
    assert int(np.asarray(m).sum()) >= 10
    pts = np.asarray(uv)[np.asarray(m)]
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] < 128).all()
    assert (pts[:, 1] >= 0).all() and (pts[:, 1] < 128).all()


def test_detect_grid_pyramid_prefers_fine_levels(rng):
    """On a sharp image, multi-scale output should consist of level-0
    detections (finest level wins each cell's budget)."""
    img = squares_image(rng, 128, 128)
    pyr = pyramid.build_pyramid(jnp.array(img), 4)
    uv0, s0, m0 = fast.detect_grid(
        pyr[0], threshold=40.0, grid=(4, 4), per_cell=4
    )
    uv, s, m = fast.detect_grid_pyramid(
        pyr, threshold=40.0, grid=(4, 4), per_cell=4, levels=3
    )
    a = np.asarray(uv)[np.asarray(m)]
    b = np.asarray(uv0)[np.asarray(m0)]
    # Where level 0 filled a cell's budget, the multi-scale result must
    # be the same corners (integer coords, no half-pixel offsets).
    if len(b):
        d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
        assert (d.min(axis=0) < 1e-3).mean() > 0.9


def test_lk_tracks_pure_translation(rng):
    img = smooth_texture(rng, 128, 160)
    dx, dy = 3.7, -2.3
    # Shift by (dx, dy) with bilinear sampling to build the "current" image.
    from scipy.ndimage import map_coordinates

    vs, us = np.meshgrid(np.arange(128), np.arange(160), indexing="ij")
    cur = map_coordinates(img, [vs + dy, us + dx], order=1, mode="nearest").astype(
        np.float32
    )
    pyr_ref = pyramid.build_pyramid(jnp.array(img))
    pyr_cur = pyramid.build_pyramid(jnp.array(cur))
    kps = jnp.array(
        np.stack(
            [rng.uniform(20, 140, 64), rng.uniform(20, 108, 64)], axis=-1
        ).astype(np.float32)
    )
    mask = jnp.ones(64, dtype=bool)
    kp_cur, err, ok = lk.track(pyr_ref, pyr_cur, kps, mask)
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.8
    flow = np.asarray(kp_cur) - np.asarray(kps)
    # Tracked flow equals the known shift: cur(x) = ref(x + d) means
    # features at ref position p appear at cur position p - d.
    est = flow[ok_np]
    assert np.allclose(est.mean(axis=0), [-dx, -dy], atol=0.1)
    assert np.abs(est - [-dx, -dy]).max() < 0.5


def test_lk_large_motion_needs_pyramid(rng):
    img = smooth_texture(rng, 128, 160)
    shift = 17.0  # larger than patch; only coarse-to-fine can catch it
    from scipy.ndimage import map_coordinates

    vs, us = np.meshgrid(np.arange(128), np.arange(160), indexing="ij")
    cur = map_coordinates(img, [vs, us + shift], order=1, mode="nearest").astype(
        np.float32
    )
    pyr_ref = pyramid.build_pyramid(jnp.array(img))
    pyr_cur = pyramid.build_pyramid(jnp.array(cur))
    kps = jnp.array(
        np.stack([rng.uniform(40, 120, 32), rng.uniform(30, 98, 32)], axis=-1).astype(
            np.float32
        )
    )
    kp_cur, err, ok = lk.track(pyr_ref, pyr_cur, kps, jnp.ones(32, bool))
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.5
    flow = (np.asarray(kp_cur) - np.asarray(kps))[ok_np]
    assert np.allclose(flow.mean(axis=0), [-shift, 0.0], atol=0.3)


def _render_plane(intr, R, t, texture, tex_scale=40.0, h=120, w=160, z0=5.0):
    """Render a textured fronto-parallel plane (z=z0 in world) into a camera."""
    vs, us = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv = np.stack([us, vs], -1).reshape(-1, 2).astype(np.float32)
    # Backproject pixel rays of camera (R, t) onto the world plane z = z0.
    Rn, tn = np.asarray(R), np.asarray(t)
    x = (uv[:, 0] - float(intr.cx)) / float(intr.fx)
    y = (uv[:, 1] - float(intr.cy)) / float(intr.fy)
    rays_c = np.stack([x, y, np.ones_like(x)], -1)
    rays_w = rays_c @ Rn  # R^T rays
    origin = -Rn.T @ tn
    s = (z0 - origin[2]) / rays_w[:, 2]
    pts_w = origin + s[:, None] * rays_w
    tex_uv = pts_w[:, :2] * tex_scale + np.array(texture.shape)[::-1] / 2.0
    from scipy.ndimage import map_coordinates

    vals = map_coordinates(
        texture, [tex_uv[:, 1], tex_uv[:, 0]], order=1, mode="nearest"
    )
    return vals.reshape(h, w).astype(np.float32), pts_w.reshape(h, w, 3)


def test_direct_pose_estimation_recovers_motion(rng):
    intr = camera.Intrinsics.create(120.0, 120.0, 80.0, 60.0)
    tex = smooth_texture(rng, 256, 256)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    xi_true = np.array([0.08, -0.05, 0.03, 0.01, -0.015, 0.01], np.float32)
    R2, t2 = se3.se3_exp(jnp.array(xi_true))
    img1, pts_w = _render_plane(intr, R1, t1, tex)
    img2, _ = _render_plane(intr, np.asarray(R2), np.asarray(t2), tex)
    # Map points: subsample the known 3-D plane points seen in frame 1.
    sel_v = rng.integers(10, 110, 80)
    sel_u = rng.integers(10, 150, 80)
    points = jnp.array(pts_w[sel_v, sel_u])
    pyr1 = pyramid.build_pyramid(jnp.array(img1))
    pyr2 = pyramid.build_pyramid(jnp.array(img2))
    R_est, t_est, cost = direct.estimate_pose(
        pyr1, pyr2, jnp.array(R1), jnp.array(t1), points, jnp.ones(80, bool),
        intr, jnp.array(R1), jnp.array(t1),
    )
    # Recovered pose should match the true camera-2 pose.
    xi_err = np.asarray(
        se3.se3_log(*se3.compose(*se3.inverse(R_est, t_est), R2, t2))
    )
    assert np.linalg.norm(xi_err) < 0.01, (xi_err, np.asarray(xi_true))
    assert float(cost) < 30.0


def test_pixel_jacobian_matches_autodiff(rng):
    intr = camera.Intrinsics.create(120.0, 120.0, 80.0, 60.0)
    p = jnp.array([0.3, -0.2, 4.0], jnp.float32)

    def proj_of_xi(xi):
        dR, dt = se3.se3_exp(xi)
        pc = se3.transform(dR, dt, p)
        uv, _ = camera.project(pc, intr)
        return uv

    J_auto = jax.jacobian(proj_of_xi)(jnp.zeros(6))
    J_analytic = direct.pixel_jacobian(p, intr)
    assert np.allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-3)


def test_templated_tracking_reuses_templates(rng):
    """Frozen keyframe templates must track MULTIPLE later frames,
    including forward motion where the depth-ratio scale warp matters
    (a template pixel spans d_ref/d_cur current-image pixels)."""
    intr = camera.Intrinsics.create(120.0, 120.0, 80.0, 60.0)
    tex = smooth_texture(rng, 256, 256)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    img1, pts_w = _render_plane(intr, R1, t1, tex)
    sel_v = rng.integers(10, 110, 80)
    sel_u = rng.integers(10, 150, 80)
    points = jnp.array(pts_w[sel_v, sel_u])
    pyr1 = pyramid.build_pyramid(jnp.array(img1))
    templates = direct.build_templates(
        pyr1, jnp.array(R1), jnp.array(t1), points, jnp.ones(80, bool), intr
    )
    # Two target frames from ONE template build: a small twist and a
    # large forward step (plane at z=5, step 0.8 => 19% scale change).
    twists = [
        np.array([0.05, -0.03, 0.02, 0.008, -0.01, 0.006], np.float32),
        np.array([0.0, 0.0, 0.8, 0.0, 0.0, 0.0], np.float32),
    ]
    for xi_true in twists:
        R2, t2 = se3.se3_exp(jnp.array(xi_true))
        img2, _ = _render_plane(intr, np.asarray(R2), np.asarray(t2), tex)
        pyr2 = pyramid.build_pyramid(jnp.array(img2))
        R_est, t_est, _ = direct.estimate_pose_templated(
            templates, pyr2, points, intr, jnp.array(R1), jnp.array(t1)
        )
        xi_err = np.asarray(
            se3.se3_log(*se3.compose(*se3.inverse(R_est, t_est), R2, t2))
        )
        assert np.linalg.norm(xi_err) < 0.02, (xi_err, xi_true)
