"""Tests for RANSAC and two-view initialization on synthetic scenes
with outliers and known ground-truth motion."""

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import se3
from viso_tpu.ops import ransac, twoview


def make_correspondences(rng, n=256, outlier_frac=0.3, noise_px=0.3, focal=520.0):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.3, -0.05, 0.05, 0.02, -0.04, 0.03], np.float32)
    R2, t2 = se3.se3_exp(jnp.array(xi))
    R2, t2 = np.asarray(R2), np.asarray(t2)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    # Pixel noise in normalized units.
    x1 = x1 + rng.normal(0, noise_px / focal, x1.shape).astype(np.float32)
    x2 = x2 + rng.normal(0, noise_px / focal, x2.shape).astype(np.float32)
    # Replace a fraction with gross outliers.
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    x2[out_idx] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    gt_inlier = np.ones(n, bool)
    gt_inlier[out_idx] = False
    return (
        jnp.array(x1),
        jnp.array(x2),
        gt_inlier,
        (R2, t2 / np.linalg.norm(t2)),
        pts,
    )


def test_essential_ransac_rejects_outliers(rng):
    x1, x2, gt_inlier, (R2, t2u), _ = make_correspondences(rng)
    key = jax.random.PRNGKey(0)
    mask = jnp.ones(x1.shape[0], bool)
    res = ransac.essential_ransac(key, x1, x2, mask, threshold=4e-6)
    inl = np.asarray(res.inliers)
    # Should keep most true inliers and reject most outliers.
    assert inl[gt_inlier].mean() > 0.85
    assert inl[~gt_inlier].mean() < 0.1


def test_twoview_initialize_recovers_motion(rng):
    x1, x2, gt_inlier, (R2, t2u), pts = make_correspondences(
        rng, outlier_frac=0.2
    )
    key = jax.random.PRNGKey(1)
    mask = jnp.ones(x1.shape[0], bool)
    # The reference's parallax gate *accepts* only <=1 deg (viso.cpp:561-571,
    # tuned for far scenes); this synthetic scene has ~2.5 deg parallax, so
    # widen the gate while keeping the same semantics.
    params = twoview.TwoViewParams(
        projection_error_thresh=1.0, parallax_thresh_deg=15.0
    )
    res = twoview.initialize(key, x1, x2, mask, params)
    assert bool(res.disparity_ok)
    assert int(res.num_inliers) > 100
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    # Rotation error in degrees.
    cos_err = (np.trace(R_est @ R2.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos_err, -1, 1))) < 1.0
    # Translation direction error (scale is free in monocular).
    t_est_u = t_est / (np.linalg.norm(t_est) + 1e-12)
    assert np.degrees(np.arccos(np.clip(abs(t_est_u @ t2u), -1, 1))) < 3.0
    # Triangulated inlier points match ground truth up to the mean-depth
    # scale factor applied by the initializer.
    inl = np.asarray(res.inliers)
    est_pts = np.asarray(res.points)[inl]
    true_pts = pts[inl]
    scale = np.median(true_pts[:, 2]) / np.median(est_pts[:, 2])
    rel_err = np.linalg.norm(est_pts * scale - true_pts, axis=-1) / np.linalg.norm(
        true_pts, axis=-1
    )
    assert np.median(rel_err) < 0.05


def test_twoview_low_disparity_flagged(rng):
    # Nearly identical frames -> disparity gate must reject (viso.cpp:197-218).
    n = 128
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)],
        axis=-1,
    ).astype(np.float32)
    x1 = pts[:, :2] / pts[:, 2:3]
    x2 = x1 + rng.normal(0, 0.05 / 520.0, x1.shape).astype(np.float32)
    res = twoview.initialize(
        jax.random.PRNGKey(2), jnp.array(x1), jnp.array(x2), jnp.ones(n, bool)
    )
    assert not bool(res.disparity_ok)
