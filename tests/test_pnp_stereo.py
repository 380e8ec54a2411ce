"""Tests for PnP RANSAC, stereo matching, and map-to-frame alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import camera, se3
from viso_tpu.ops import align, pnp, pyramid, stereo

from tests.test_frontend import smooth_texture


def test_pnp_ransac_with_outliers(rng):
    n = 200
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.2, -0.1, 0.3, 0.05, -0.03, 0.08], np.float32)
    R_true, t_true = map(np.asarray, se3.se3_exp(jnp.array(xi)))
    pc = pts @ R_true.T + t_true
    x = pc[:, :2] / pc[:, 2:3]
    x = x + rng.normal(0, 0.5 / 520.0, x.shape).astype(np.float32)
    # 25% outliers.
    n_out = 50
    out_idx = rng.choice(n, n_out, replace=False)
    x[out_idx] += rng.uniform(0.03, 0.3, (n_out, 2)).astype(np.float32)
    # Gate ~2 px normalized: with 0.5 px/coord noise the chi2(2) tail above
    # a 1 px gate is ~12%, so use a threshold matched to the noise level.
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), jnp.array(pts), jnp.array(x), jnp.ones(n, bool),
        threshold=1.6e-5,
    )
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_est @ R_true.T) - 1) / 2, -1, 1))
    )
    assert ang < 0.2
    assert np.linalg.norm(t_est - t_true) < 0.02
    inl = np.asarray(res.inliers)
    gt_out = np.zeros(n, bool)
    gt_out[out_idx] = True
    assert inl[~gt_out].mean() > 0.9
    assert inl[gt_out].mean() < 0.1


def test_pnp_dlt_exact(rng):
    # Noise-free minimal-ish fit should recover the pose nearly exactly.
    pts = np.stack(
        [rng.uniform(-2, 2, 12), rng.uniform(-2, 2, 12), rng.uniform(5, 10, 12)],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.1, 0.2, -0.1, 0.02, 0.05, -0.03], np.float32)
    R_true, t_true = map(np.asarray, se3.se3_exp(jnp.array(xi)))
    pc = pts @ R_true.T + t_true
    x = pc[:, :2] / pc[:, 2:3]
    R, t = pnp._dlt_pnp(jnp.array(pts), jnp.array(x))
    assert np.allclose(np.asarray(R), R_true, atol=1e-3)
    assert np.allclose(np.asarray(t), t_true, atol=1e-2)


def test_stereo_matching(rng):
    img = smooth_texture(rng, 96, 160)
    true_disp = 11.6
    from scipy.ndimage import map_coordinates

    vs, us = np.meshgrid(np.arange(96), np.arange(160), indexing="ij")
    right = map_coordinates(
        img, [vs, us + true_disp], order=1, mode="nearest"
    ).astype(np.float32)
    kps = np.stack(
        [rng.uniform(40, 150, 48), rng.uniform(10, 86, 48)], axis=-1
    ).astype(np.float32)
    disp, cost, ok = stereo.match(
        jnp.array(img), jnp.array(right), jnp.array(kps), jnp.ones(48, bool),
        stereo.StereoParams(max_disparity=32),
    )
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.8
    est = np.asarray(disp)[ok_np]
    assert np.abs(est - true_disp).max() < 0.35
    z = stereo.disparity_to_depth(disp, focal=520.0, baseline=0.54, ok=ok)
    assert np.allclose(
        np.asarray(z)[ok_np], 520.0 * 0.54 / est, atol=1e-3
    )


def test_align_refines_predictions(rng):
    img = smooth_texture(rng, 128, 160)
    shift = np.array([2.3, -1.7], np.float32)
    from scipy.ndimage import map_coordinates

    vs, us = np.meshgrid(np.arange(128), np.arange(160), indexing="ij")
    cur = map_coordinates(
        img, [vs + shift[1], us + shift[0]], order=1, mode="nearest"
    ).astype(np.float32)
    pyr_kf = pyramid.build_pyramid(jnp.array(img))
    pyr_cur = pyramid.build_pyramid(jnp.array(cur))
    # Two identical keyframes stacked; pairs reference either.
    kf_pyrs = tuple(jnp.stack([p, p]) for p in pyr_kf)
    n = 32
    uv_ref = jnp.array(
        np.stack([rng.uniform(30, 130, n), rng.uniform(30, 98, n)], -1).astype(
            np.float32
        )
    )
    k_idx = jnp.array(rng.integers(0, 2, n), jnp.int32)
    # Predictions off by up to 1.5 px from the true match position.
    true_uv = uv_ref - shift[None, :]
    uv_pred = true_uv + jnp.array(
        rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    )
    uv_out, err, ok = align.align(
        kf_pyrs, k_idx, uv_ref, pyr_cur, uv_pred, jnp.ones(n, bool)
    )
    ok_np = np.asarray(ok)
    assert ok_np.mean() > 0.8
    d = np.linalg.norm(np.asarray(uv_out) - np.asarray(true_uv), axis=-1)
    assert np.median(d[ok_np]) < 0.1


def test_select_reference_keyframes():
    # Point on the optical axis of kf0 but oblique to kf1 -> picks kf0.
    pts = jnp.array([[0.0, 0.0, 5.0]], jnp.float32)
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    xi = jnp.array([2.0, 0.0, 0.0, 0.0, -0.5, 0.0])  # shifted + rotated
    R1, t1 = se3.se3_exp(xi)
    kf_R = jnp.stack([R0, R1])
    kf_t = jnp.stack([t0, t1])
    k, cos = align.select_reference_keyframes(
        pts, kf_R, kf_t, jnp.ones(2, bool)
    )
    assert int(k[0]) == 0
    assert float(cos[0]) > 0.999
