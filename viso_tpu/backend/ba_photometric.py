"""Photometric (direct) bundle adjustment: LM + Schur on patch residuals.

This is the realization of the reference's *stated* backend design: the
dead g2o skeleton (`/root/reference/include/bundle_adjuster.h`) defines
``EdgeDirectProjection`` — a 16-dimensional photometric error over a 4x4
patch between a point and a pose (bundle_adjuster.h:58-106) — with
``BlockSolver<6,3>`` + Levenberg-Marquardt (":108-119") and marginalized
landmarks => Schur complement (":128"). Here each landmark stores a 4x4
template sampled from its anchor keyframe, and every observing camera
contributes a 16-dim residual of current-image intensities at the
landmark's projection.

Same dense (C, L) masked-grid layout and branchless LM as backend/ba.py;
the per-pixel chain rule uses the fused 4-gather bilinear gradient.
Landmarks are parameterized by full 3-D position (like the reference's
``VertexPoint``, bundle_adjuster.h:24-39).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viso_tpu.backend import robust
from viso_tpu.backend.ba import _inv3x3
from viso_tpu.geometry import camera as cam_mod
from viso_tpu.geometry import sampling, se3


class PhotoBAProblem(NamedTuple):
    R: jnp.ndarray          # (C, 3, 3)
    t: jnp.ndarray          # (C, 3)
    points: jnp.ndarray     # (L, 3)
    images: jnp.ndarray     # (C, H, W) the keyframe images (one level)
    template: jnp.ndarray   # (L, P*P) patch intensities from anchor kf
    anchor_idx: jnp.ndarray  # (L,) keyframe that owns each template
    obs_mask: jnp.ndarray   # (C, L)
    cam_mask: jnp.ndarray   # (C,)
    point_mask: jnp.ndarray  # (L,)
    cam_fixed: jnp.ndarray | None = None


class PhotoBAParams(NamedTuple):
    iters: int = 8
    half_patch: int = 2          # 4x4 patch = 16-dim residual (ref :58)
    huber: float = 12.0          # gray levels
    lam0: float = 1e-3
    lam_up: float = 4.0
    lam_down: float = 0.5
    num_fixed: int = 1
    min_depth: float = 1e-2


def make_template(images, anchor_idx, points, R, t, intr, half_patch=2):
    """Sample each landmark's template patch from its anchor keyframe.

    images (C, H, W); anchor_idx (L,) keyframe index per landmark.
    Returns (L, P*P) template.
    """
    p_cam = jnp.einsum("lij,lj->li", R[anchor_idx], points) + t[anchor_idx]
    uv, depth = cam_mod.project(p_cam, intr)
    offs = sampling.patch_offsets(half_patch, uv.dtype).reshape(-1, 2)
    uv_patch = uv[:, None, :] + offs[None]
    return sampling.bilinear_indexed(images, anchor_idx, uv_patch)


def _residuals_jacobians(prob: PhotoBAProblem, R, t, points, intr,
                         params: PhotoBAParams):
    """r (C, L, P2), Jc (C, L, P2, 6), Jp (C, L, P2, 3), valid (C, L)."""
    C, H, W = prob.images.shape
    L = points.shape[0]
    half = params.half_patch
    p_cam = jnp.einsum("cij,lj->cli", R, points) + t[:, None, :]  # (C, L, 3)
    uv, depth = cam_mod.project(p_cam, intr)
    ok = (
        prob.obs_mask
        & prob.cam_mask[:, None]
        & prob.point_mask[None, :]
        & (depth > params.min_depth)
        & cam_mod.is_inside(uv, H, W, border=half + 1)
    )
    offs = sampling.patch_offsets(half, uv.dtype).reshape(-1, 2)  # (P2, 2)
    # Scale-warp the patch per observation by the anchor/current depth
    # ratio: without it, forward motion changes the patch footprint and
    # the template mismatches by tens of gray levels even at the truth.
    d_anchor = (
        jnp.einsum("lj,lj->l", points, prob.R[prob.anchor_idx][:, 2, :])
        + prob.t[prob.anchor_idx][:, 2]
    )  # (L,) depth in each landmark's anchor keyframe
    scale = jnp.clip(d_anchor[None, :] / jnp.maximum(depth, 1e-3), 0.33, 3.0)
    scale = jax.lax.stop_gradient(scale)
    uv_patch = uv[:, :, None, :] + offs[None, None] * scale[..., None, None]
    cam_idx = jnp.broadcast_to(jnp.arange(C)[:, None], (C, L)).reshape(-1)
    I, g = sampling.bilinear_indexed_with_grad(
        prob.images, cam_idx, uv_patch.reshape(C * L, -1, 2)
    )
    I = I.reshape(C, L, -1)
    g = g.reshape(C, L, -1, 2)
    r = jnp.where(ok[..., None], I - prob.template[None], 0.0)
    # Chain rule: dI/du (1x2) . du/dp_cam (2x3) . [dp_cam/dxi | R].
    X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    iz = 1.0 / jnp.maximum(Z, 1e-9)
    iz2 = iz * iz
    fx, fy = intr.fx, intr.fy
    zero = jnp.zeros_like(X)
    du = jnp.stack([fx * iz, zero, -fx * X * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * Y * iz2], axis=-1)
    dproj = jnp.stack([du, dv], axis=-2)                      # (C, L, 2, 3)
    dcam = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (C, L, 3, 3)),
            -se3.hat(p_cam),
        ],
        axis=-1,
    )                                                          # (C, L, 3, 6)
    J_uv_xi = dproj @ dcam                                     # (C, L, 2, 6)
    J_uv_p = dproj @ R[:, None]                                # (C, L, 2, 3)
    Jc = jnp.einsum("clpi,clij->clpj", g, J_uv_xi)
    Jp = jnp.einsum("clpi,clij->clpj", g, J_uv_p)
    Jc = Jc * ok[..., None, None]
    Jp = Jp * ok[..., None, None]
    return r, Jc, Jp, ok


def compute_cost(prob: PhotoBAProblem, intr, params: PhotoBAParams, R=None,
                 t=None, points=None):
    R = prob.R if R is None else R
    t = prob.t if t is None else t
    points = prob.points if points is None else points
    r, _, _, ok = _residuals_jacobians(prob, R, t, points, intr, params)
    r_norm = jnp.linalg.norm(r, axis=-1)
    return jnp.sum(jnp.where(ok, robust.huber_cost(r_norm, params.huber * 4), 0.0))


def _lm_iteration(prob, R, t, points, intr, lam, params):
    C = R.shape[0]
    r, Jc, Jp, ok = _residuals_jacobians(prob, R, t, points, intr, params)
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(ok, robust.huber_weight(r_norm, params.huber * 4), 0.0)
    Jc_w = Jc * w[..., None, None]
    Jp_w = Jp * w[..., None, None]
    U = jnp.einsum("clpi,clpj->cij", Jc_w, Jc)
    V = jnp.einsum("clpi,clpj->lij", Jp_w, Jp)
    W = jnp.einsum("clpi,clpj->clij", Jc_w, Jp)
    g_c = -jnp.einsum("clpi,clp->ci", Jc_w, r)
    g_p = -jnp.einsum("clpi,clp->li", Jp_w, r)

    eye6 = jnp.eye(6, dtype=r.dtype)
    eye3 = jnp.eye(3, dtype=r.dtype)
    U_d = U + lam * (jnp.einsum("cii->c", U) / 6.0 + 1e-6)[:, None, None] * eye6
    V_d = V + lam * (jnp.einsum("lii->l", V) / 3.0 + 1e-6)[:, None, None] * eye3
    V_inv = _inv3x3(V_d) * prob.point_mask[:, None, None]
    Y = jnp.einsum("clij,ljk->clik", W, V_inv)
    S = -jnp.einsum("clik,dljk->cdij", Y, W)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U_d)
    b_red = g_c - jnp.einsum("clik,lk->ci", Y, g_p)

    free = prob.cam_mask & (jnp.arange(C) >= params.num_fixed)
    if prob.cam_fixed is not None:
        free = free & ~prob.cam_fixed
    f = free.astype(r.dtype)
    S = S * f[:, None, None, None] * f[None, :, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add((1 - f)[:, None, None] * eye6)
    b_red = b_red * f[:, None]
    S_flat = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    delta_c = jnp.linalg.solve(S_flat, b_red.reshape(-1)).reshape(C, 6)
    delta_c = jnp.where(jnp.isfinite(delta_c), delta_c, 0.0) * f[:, None]
    delta_p = jnp.einsum(
        "lij,lj->li", V_inv, g_p - jnp.einsum("clij,ci->lj", W, delta_c)
    )
    delta_p = jnp.where(jnp.isfinite(delta_p), delta_p, 0.0)
    delta_p = delta_p * prob.point_mask[:, None]
    R_new, t_new = jax.vmap(se3.left_update)(delta_c, R, t)
    return R_new, t_new, points + delta_p


@partial(jax.jit, static_argnames=("params",))
def solve(prob: PhotoBAProblem, intr, params: PhotoBAParams = PhotoBAParams()):
    """Photometric LM + Schur over the window. Returns (problem, info)."""

    def body(state, _):
        R, t, points, lam, cost = state
        R_n, t_n, p_n = _lm_iteration(prob, R, t, points, intr, lam, params)
        new_cost = compute_cost(prob, intr, params, R_n, t_n, p_n)
        accept = new_cost < cost
        R = jnp.where(accept, R_n, R)
        t = jnp.where(accept, t_n, t)
        points = jnp.where(accept, p_n, points)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * params.lam_down, 1e-9),
            jnp.minimum(lam * params.lam_up, 1e6),
        )
        return (R, t, points, lam, cost), cost

    cost0 = compute_cost(prob, intr, params)
    init = (prob.R, prob.t, prob.points, jnp.asarray(params.lam0, prob.R.dtype), cost0)
    (R, t, points, lam, cost), hist = jax.lax.scan(
        body, init, None, length=params.iters
    )
    return prob._replace(R=R, t=t, points=points), {
        "initial_cost": cost0,
        "final_cost": cost,
        "cost_history": hist,
    }
