"""Perspective-n-Point pose estimation (3D->2D), RANSAC + GN refinement.

The reference never implements PnP (its tracking is direct photometric,
viso.cpp:640-766); the north star (BASELINE.json config 2) requires PnP
for stereo VO. Design mirrors ops/ransac.py: a vmapped 6-point DLT
minimal solver over many hypotheses, MSAC scoring, then Gauss-Newton
refinement on SE(3) with a robust kernel over all inliers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viso_tpu.backend import robust
from viso_tpu.geometry import se3


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def _dlt_pnp(points_w, x):
    """6+ point DLT: solve P = [R|t] from world points and normalized obs.

    points_w (k, 3), x (k, 2). Returns (R (3,3), t (3,)) with R projected
    onto SO(3) via SVD (the DLT estimate is only approximately a rotation).
    """
    k = points_w.shape[0]
    zeros = jnp.zeros((k, 4), points_w.dtype)
    Xh = jnp.concatenate([points_w, jnp.ones((k, 1), points_w.dtype)], axis=-1)
    row_u = jnp.concatenate([Xh, zeros, -x[:, 0:1] * Xh], axis=-1)
    row_v = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=0)  # (2k, 12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0].reshape(3, 4)
    M = p[:, :3]
    # Sign: points must be in front (positive depth for the majority).
    depths = Xh @ p[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths)) >= 0, 1.0, -1.0)
    M = M * sign
    tvec = p[:, 3] * sign
    # Project M onto SO(3): R = U V^T, and rescale t by the mean singular value.
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], M.dtype)).at[2, 2].set(det)
    R = U @ D @ Vt
    scale = jnp.mean(s)
    t = tvec / jnp.maximum(scale, 1e-12)
    return R, t


def reprojection_residual(R, t, points_w, x):
    """Normalized reprojection errors (N,) squared."""
    pc = se3.transform(R, t, points_w)
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = pc[..., :2] / z_safe[..., None]
    err = jnp.sum((proj - x) ** 2, axis=-1)
    # Behind-camera points are automatic outliers.
    return jnp.where(z > 1e-6, err, 1e6)


def refine_pose(R0, t0, points_w, x, mask, huber, iters: int = 10):
    """Robust GN on SE(3) minimizing reprojection error (all masked points)."""

    def residual_vec(xi, R, t):
        Rp, tp = se3.left_update(xi, R, t)
        pc = se3.transform(Rp, tp, points_w)
        z = jnp.maximum(pc[..., 2], 1e-6)
        proj = pc[..., :2] / z[..., None]
        return (proj - x).reshape(-1)

    jac = jax.jacfwd(residual_vec)

    def step(state, _):
        R, t, lam = state
        xi0 = jnp.zeros(6, points_w.dtype)
        r = residual_vec(xi0, R, t)
        J = jac(xi0, R, t)  # (2N, 6)
        r2 = r.reshape(-1, 2)
        r_norm = jnp.linalg.norm(r2, axis=-1)
        w = mask * robust.huber_weight(r_norm, huber)
        w2 = jnp.repeat(w, 2)
        Jw = J * w2[:, None]
        H = Jw.T @ J + lam * jnp.eye(6, dtype=points_w.dtype)
        g = Jw.T @ r
        d = jnp.linalg.solve(H, -g)
        d = jnp.where(jnp.all(jnp.isfinite(d)), d, jnp.zeros_like(d))

        def cost(rr):
            rn = jnp.linalg.norm(rr.reshape(-1, 2), axis=-1)
            return jnp.sum(mask * robust.huber_cost(rn, huber))

        c0 = cost(r)
        c1 = cost(residual_vec(d, R, t))
        accept = c1 < c0
        R_n, t_n = se3.left_update(jnp.where(accept, d, 0.0), R, t)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 10, 1e4))
        return (R_n, t_n, lam), None

    (R, t, _), _ = jax.lax.scan(
        step, (R0, t0, jnp.asarray(1e-3, points_w.dtype)), None, length=iters
    )
    return R, t


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def pnp_ransac(
    key,
    points_w,
    x,
    mask,
    threshold: float = 4e-6,
    num_hypotheses: int = 512,
    refine_iters: int = 10,
):
    """RANSAC PnP: world points (N, 3), normalized obs (N, 2), mask (N,).

    `threshold` gates squared normalized reprojection error.
    """
    logits = jnp.where(mask, 0.0, -jnp.inf)
    idx = jax.random.categorical(
        key, logits[None, :], shape=(num_hypotheses, 6)
    )
    Rs, ts = jax.vmap(_dlt_pnp)(points_w[idx], x[idx])
    res = jax.vmap(lambda R, t: reprojection_residual(R, t, points_w, x))(Rs, ts)
    res = jnp.where(mask[None, :], res, threshold)
    scores = jnp.sum(jnp.minimum(res, threshold), axis=-1)  # MSAC
    best = jnp.argmin(scores)
    R0, t0 = Rs[best], ts[best]
    # Robust GN refinement over all masked points.
    R, t = refine_pose(
        R0, t0, points_w, x, mask.astype(points_w.dtype),
        huber=jnp.sqrt(threshold), iters=refine_iters,
    )
    final = reprojection_residual(R, t, points_w, x)
    inl = (final < threshold) & mask
    # Keep refined pose only if it didn't get worse.
    inl0 = (res[best] < threshold) & mask
    better = jnp.sum(inl) >= jnp.sum(inl0)
    R = jnp.where(better, R, R0)
    t = jnp.where(better, t, t0)
    inl = jnp.where(better, inl, inl0)
    return PnPResult(R, t, inl, jnp.sum(inl))
