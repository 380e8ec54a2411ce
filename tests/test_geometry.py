"""Tests for camera, sampling, triangulation, and epipolar geometry."""

import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import camera, epipolar, sampling, se3, triangulation


def make_intr():
    # TUM freiburg1-style calibration hard-coded in the reference (main.cpp:14-17).
    return camera.Intrinsics.create(517.3, 516.5, 325.1, 249.7)


def random_scene(rng, n=60, depth=(4.0, 10.0)):
    """Random points in front of camera 1, plus a second camera with known motion."""
    pts = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(*depth, n),
        ],
        axis=-1,
    ).astype(np.float32)
    R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    xi = np.array([0.3, -0.1, 0.05, 0.02, -0.04, 0.03], np.float32)
    R2, t2 = se3.se3_exp(jnp.array(xi))
    return pts, (R1, t1), (np.asarray(R2), np.asarray(t2))


def test_project_backproject_roundtrip(rng):
    intr = make_intr()
    pts = jnp.array(rng.uniform(0.5, 10.0, size=(40, 3)).astype(np.float32))
    uv, depth = camera.project(pts, intr)
    back = camera.backproject(uv, depth, intr)
    assert np.allclose(np.asarray(back), np.asarray(pts), rtol=1e-5, atol=1e-4)


def test_intrinsics_level_scaling():
    intr = make_intr()
    l1 = intr.at_level(1)
    assert np.isclose(float(l1.fx), 517.3 * 0.5)
    # Pixel-center-aligned halving: cx' = (cx + .5)/2 - .5
    assert np.isclose(float(l1.cx), (325.1 + 0.5) * 0.5 - 0.5)


def test_normalize_denormalize(rng):
    intr = make_intr()
    uv = jnp.array(rng.uniform(0, 500, size=(13, 2)).astype(np.float32))
    xy = camera.normalize(uv, intr)
    back = camera.denormalize(xy, intr)
    assert np.allclose(np.asarray(back), np.asarray(uv), atol=1e-4)


def test_is_inside():
    uv = jnp.array([[5.0, 5.0], [-1.0, 5.0], [636.0, 470.0], [100.0, 100.0]])
    mask = camera.is_inside(uv, height=480, width=640, border=4)
    assert np.array_equal(np.asarray(mask), [True, False, False, True])


def test_bilinear_matches_scipy(rng):
    from scipy.ndimage import map_coordinates

    img = rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(1, 62, 100), rng.uniform(1, 46, 100)], axis=-1
    ).astype(np.float32)
    out = np.asarray(sampling.bilinear(jnp.array(img), jnp.array(uv)))
    ref = map_coordinates(img, [uv[:, 1], uv[:, 0]], order=1, mode="nearest")
    assert np.allclose(out, ref, atol=1e-3)


def test_gradient_on_linear_ramp():
    # I(u, v) = 3u + 5v has exact gradient (3, 5) everywhere inside.
    H, W = 32, 32
    vs, us = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.array((3.0 * us + 5.0 * vs).astype(np.float32))
    uv = jnp.array([[10.3, 12.7], [5.5, 20.2]], dtype=jnp.float32)
    g = np.asarray(sampling.gradient(img, uv))
    assert np.allclose(g, [[3.0, 5.0], [3.0, 5.0]], atol=1e-3)


def test_sample_patches_shape(rng):
    img = jnp.array(rng.uniform(0, 1, size=(64, 64)).astype(np.float32))
    centers = jnp.array([[20.0, 20.0], [30.5, 10.25]], dtype=jnp.float32)
    patches = sampling.sample_patches(img, centers, half=4)
    assert patches.shape == (2, 8, 8)
    # Integer center on integer image = direct lookup.
    assert np.isclose(float(patches[0, 4, 4]), float(img[20, 20]), atol=1e-5)


def test_triangulate_recovers_points(rng):
    pts, (R1, t1), (R2, t2) = random_scene(rng)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    Xw, d1, d2 = triangulation.triangulate(
        jnp.array(x1), jnp.array(x2), jnp.array(R1), jnp.array(t1), jnp.array(R2), jnp.array(t2)
    )
    assert np.allclose(np.asarray(Xw), pts, atol=1e-2)
    assert np.all(np.asarray(d1) > 0) and np.all(np.asarray(d2) > 0)
    err = np.asarray(triangulation.reprojection_error(Xw, jnp.array(x1), jnp.array(R1), jnp.array(t1)))
    assert np.max(err) < 1e-3


def test_parallax_cos(rng):
    pts, (R1, t1), (R2, t2) = random_scene(rng)
    cos = np.asarray(
        triangulation.parallax_cos(jnp.array(pts), jnp.array(R1), jnp.array(t1), jnp.array(R2), jnp.array(t2))
    )
    assert np.all(cos <= 1.0 + 1e-6) and np.all(cos > 0.9)  # small baseline


def test_fit_essential_and_residual(rng):
    pts, (R1, t1), (R2, t2) = random_scene(rng, n=100)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    E = epipolar.fit_essential(jnp.array(x1), jnp.array(x2))
    res = np.asarray(epipolar.epipolar_residual(E, jnp.array(x1), jnp.array(x2)))
    assert np.max(res) < 1e-6  # noise-free Sampson distance ~ 0
    # E should encode the true motion: E ~ [t]x R up to scale.
    E_true = np.asarray(se3.hat(jnp.array(t2))) @ R2
    E_true = E_true / np.linalg.norm(E_true)
    E_est = np.asarray(E) / np.linalg.norm(np.asarray(E))
    align = abs(np.sum(E_true * E_est))
    assert align > 0.999


def test_decompose_essential_contains_truth(rng):
    pts, (R1, t1), (R2, t2) = random_scene(rng, n=64)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    E = epipolar.fit_essential(jnp.array(x1), jnp.array(x2))
    Rs, ts = epipolar.decompose_essential(E)
    t_unit = t2 / np.linalg.norm(t2)
    best = min(
        np.linalg.norm(np.asarray(Rs)[i] - R2) + np.linalg.norm(np.asarray(ts)[i] - t_unit)
        for i in range(4)
    )
    assert best < 1e-2


def test_fit_homography_planar(rng):
    # Points on the plane z = 5.
    n = 40
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.full(n, 5.0)], axis=-1
    ).astype(np.float32)
    R2, t2 = se3.se3_exp(jnp.array([0.2, -0.1, 0.02, 0.03, -0.02, 0.01], jnp.float32))
    R2, t2 = np.asarray(R2), np.asarray(t2)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    H = epipolar.fit_homography(jnp.array(x1), jnp.array(x2))
    res = np.asarray(epipolar.homography_residual(H, jnp.array(x1), jnp.array(x2)))
    assert np.max(res) < 1e-6


def test_decompose_homography_contains_truth(rng):
    n = 40
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.full(n, 5.0)], axis=-1
    ).astype(np.float32)
    R2, t2 = se3.se3_exp(jnp.array([0.3, -0.1, 0.02, 0.03, -0.02, 0.01], jnp.float32))
    R2, t2 = np.asarray(R2), np.asarray(t2)
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (R2 @ pts.T).T + t2
    x2 = pc2[:, :2] / pc2[:, 2:3]
    H = epipolar.fit_homography(jnp.array(x1), jnp.array(x2))
    Rs, ts, ns = epipolar.decompose_homography(H)
    t_unit = t2 / np.linalg.norm(t2)
    dists = [
        np.linalg.norm(np.asarray(Rs)[i] - R2) + np.linalg.norm(np.asarray(ts)[i] - t_unit)
        for i in range(np.asarray(Rs).shape[0])
    ]
    assert min(dists) < 5e-2
