"""Unit tests for viso_tpu.geometry.se3 against scipy/NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsp

from viso_tpu.geometry import se3


def random_rotvecs(rng, n, max_angle=3.0):
    v = rng.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    angles = rng.uniform(0.0, max_angle, size=(n, 1))
    return v * angles


def test_hat_vee_roundtrip(rng):
    w = rng.normal(size=(17, 3)).astype(np.float32)
    W = se3.hat(w)
    assert np.allclose(np.asarray(W), -np.asarray(jnp.swapaxes(W, -1, -2)))
    assert np.allclose(np.asarray(se3.vee(W)), w, atol=1e-6)


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.array(w)))
    R_ref = Rsp.from_rotvec(w).as_matrix()
    assert np.allclose(R, R_ref, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = random_rotvecs(rng, 64, max_angle=3.1).astype(np.float32)
    w_back = np.asarray(se3.so3_log(se3.so3_exp(jnp.array(w))))
    assert np.allclose(w_back, w, atol=2e-3)


def test_so3_log_small_angle():
    w = np.array([[1e-6, -2e-6, 3e-6], [0.0, 0.0, 0.0]], dtype=np.float32)
    out = np.asarray(se3.so3_log(se3.so3_exp(jnp.array(w))))
    assert np.all(np.isfinite(out))
    assert np.allclose(out, w, atol=1e-5)


def test_so3_log_near_pi():
    w = np.array([[np.pi - 1e-4, 0.0, 0.0], [0.0, np.pi - 1e-4, 0.0]], dtype=np.float64)
    R = Rsp.from_rotvec(w).as_matrix()
    out = np.asarray(se3.so3_log(jnp.array(R)))
    assert np.allclose(out, w, atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.7
    R, t = se3.se3_exp(jnp.array(xi))
    xi_back = np.asarray(se3.se3_log(R, t))
    assert np.allclose(xi_back, xi, atol=1e-4)


def test_se3_exp_zero_is_identity():
    R, t = se3.se3_exp(jnp.zeros(6))
    assert np.allclose(np.asarray(R), np.eye(3), atol=1e-7)
    assert np.allclose(np.asarray(t), 0.0, atol=1e-7)


def test_compose_inverse(rng):
    xi1 = jnp.array(rng.normal(size=6).astype(np.float32))
    xi2 = jnp.array(rng.normal(size=6).astype(np.float32))
    R1, t1 = se3.se3_exp(xi1)
    R2, t2 = se3.se3_exp(xi2)
    Rc, tc = se3.compose(R1, t1, R2, t2)
    Ri, ti = se3.inverse(R2, t2)
    Rb, tb = se3.compose(Rc, tc, Ri, ti)
    assert np.allclose(np.asarray(Rb), np.asarray(R1), atol=1e-5)
    assert np.allclose(np.asarray(tb), np.asarray(t1), atol=1e-5)


def test_transform_matches_matrix(rng):
    xi = jnp.array(rng.normal(size=6).astype(np.float32))
    R, t = se3.se3_exp(xi)
    pts = jnp.array(rng.normal(size=(11, 3)).astype(np.float32))
    out = se3.transform(R, t, pts)
    T = np.asarray(se3.make_matrix(R, t))
    hom = np.concatenate([np.asarray(pts), np.ones((11, 1), np.float32)], axis=-1)
    expect = (T @ hom.T).T[:, :3]
    assert np.allclose(np.asarray(out), expect, atol=1e-5)


def test_left_update_matches_reference_rule(rng):
    # T <- exp(xi) * T, the update at viso.cpp:737.
    xi = jnp.array((rng.normal(size=6) * 0.1).astype(np.float32))
    R, t = se3.se3_exp(jnp.array(rng.normal(size=6).astype(np.float32)))
    Ru, tu = se3.left_update(xi, R, t)
    dR, dt = se3.se3_exp(xi)
    Re, te = se3.compose(dR, dt, R, t)
    assert np.allclose(np.asarray(Ru), np.asarray(Re), atol=1e-6)
    assert np.allclose(np.asarray(tu), np.asarray(te), atol=1e-6)


def test_jit_and_grad():
    f = jax.jit(lambda xi: jnp.sum(se3.se3_exp(xi)[1] ** 2))
    g = jax.grad(f)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))


def test_relative():
    Ra, ta = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 0.3, -0.2, 0.1]))
    Rb, tb = se3.se3_exp(jnp.array([-0.2, 0.1, 0.4, -0.1, 0.2, -0.3]))
    Rab, tab = se3.relative(Ra, ta, Rb, tb)
    # T_ab * T_b == T_a
    Rc, tc = se3.compose(Rab, tab, Rb, tb)
    assert np.allclose(np.asarray(Rc), np.asarray(Ra), atol=1e-5)
    assert np.allclose(np.asarray(tc), np.asarray(ta), atol=1e-5)
