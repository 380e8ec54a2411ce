"""Trajectory evaluation: ATE / RPE with Umeyama alignment.

The reference has no evaluation tooling (SURVEY.md §5 — `std::cout` only);
ATE/RPE are the north-star metrics (BASELINE.json), so they are built in.
Conventions follow the TUM RGB-D / KITTI odometry benchmark definitions.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src, dst, with_scale=True):
    """Least-squares similarity transform aligning src -> dst.

    src, dst: (N, 3). Returns (s, R, t) with dst ~ s * R @ src + t.
    Monocular trajectories need with_scale=True (scale is unobservable).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est_positions, gt_positions, align=True, with_scale=True):
    """Absolute trajectory error (RMSE of aligned positions), meters."""
    est = np.asarray(est_positions, dtype=np.float64)
    gt = np.asarray(gt_positions, dtype=np.float64)
    assert est.shape == gt.shape
    if align:
        s, R, t = umeyama_alignment(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=-1)
    return float(np.sqrt((err**2).mean()))


def camera_centers(R_list, t_list):
    """World camera centers c = -R^T t from world->cam poses."""
    R = np.asarray(R_list)
    t = np.asarray(t_list)
    return -np.einsum("nji,nj->ni", R, t)


def rpe(est_R, est_t, gt_R, gt_t, delta=1):
    """Relative pose error over frame gaps of `delta`.

    Returns (trans_rmse, rot_rmse_deg). Poses are world->cam.
    """
    est_R, est_t = np.asarray(est_R), np.asarray(est_t)
    gt_R, gt_t = np.asarray(gt_R), np.asarray(gt_t)
    n = len(est_R)
    terrs, rerrs = [], []
    for i in range(n - delta):
        j = i + delta
        # Relative motion cam_i -> cam_j in each trajectory.
        dR_e = est_R[j] @ est_R[i].T
        dt_e = est_t[j] - dR_e @ est_t[i]
        dR_g = gt_R[j] @ gt_R[i].T
        dt_g = gt_t[j] - dR_g @ gt_t[i]
        dR = dR_e @ dR_g.T
        terrs.append(np.linalg.norm(dt_e - dR @ dt_g))
        ang = np.degrees(
            np.arccos(np.clip((np.trace(dR) - 1) / 2, -1.0, 1.0))
        )
        rerrs.append(ang)
    return float(np.sqrt(np.mean(np.square(terrs)))), float(
        np.sqrt(np.mean(np.square(rerrs)))
    )
