"""Sim(3) similarity transforms for monocular loop closure.

Monocular scale drift is unobservable to an SE(3) pose graph: a mono
loop closure must estimate and redistribute the accumulated SCALE error
as well as rotation/translation (the reference is a monocular system,
/root/reference/src/viso.cpp:7-145, so this carries its pipeline to the
backend it needed). Convention (ORB-SLAM style):

    S = (s, R, t):   x' = s * R @ x + t

Nodes store world->cam similarities (odometry enters with s=1); loop
edges measured by a masked Umeyama fit between the two keyframes'
camera-frame landmark coordinates carry the relative scale.

The tangent update uses the first-order parametrization
exp([rho, phi, sigma]) ~= (e^sigma, exp_so3(phi), rho) — an exact Sim3
log/exp (Strasdat's W matrix) only reparametrizes the GN step, and the
residual below is zero exactly at the identity either way.
"""

from __future__ import annotations

import jax.numpy as jnp

from viso_tpu.geometry import se3


def compose(sa, Ra, ta, sb, Rb, tb):
    """S_a o S_b: x -> s_a R_a (s_b R_b x + t_b) + t_a."""
    return sa * sb, Ra @ Rb, sa * (Ra @ tb) + ta


def inverse(s, R, t):
    """S^-1 = (1/s, R^T, -(1/s) R^T t)."""
    s_inv = 1.0 / s
    return s_inv, R.T, -s_inv * (R.T @ t)


def left_update(delta7, s, R, t):
    """First-order left update: S <- exp(delta) o S.

    delta7 = [rho (3), phi (3), sigma (1)].
    """
    ds, dR, dt = (
        jnp.exp(delta7[6]),
        se3.so3_exp(delta7[3:6]),
        delta7[:3],
    )
    return compose(ds, dR, dt, s, R, t)


def log_decomposed(s, R, t):
    """Naive decomposed log: [t, so3_log(R), log(s)] (7,).

    Not the exact Sim3 log (no W matrix) — used as an edge residual,
    where only 'zero iff identity' and smoothness matter.
    """
    return jnp.concatenate(
        [t, se3.so3_log(R), jnp.log(s)[None]]
    )


def umeyama_masked(src, dst, mask):
    """Masked similarity fit: dst ~= s R src + t (Umeyama 1991).

    src, dst: (N, 3); mask: (N,) weights in {0, 1} (or soft).
    Returns (s, R (3, 3), t (3,)). Degenerate masks (too few points /
    zero variance) return the identity similarity.
    """
    w = mask.astype(src.dtype)
    n = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / n
    mu_d = jnp.sum(dst * w[:, None], axis=0) / n
    sc = (src - mu_s) * w[:, None]
    dc = (dst - mu_d) * w[:, None]
    cov = dc.T @ (src - mu_s) / n                       # (3, 3)
    var_s = jnp.sum(sc * (src - mu_s)) / n
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, det], src.dtype))
    R = U @ S @ Vt
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-9)
    t = mu_d - s * (R @ mu_s)
    ok = (jnp.sum(w) >= 3.0) & (var_s > 1e-9) & jnp.isfinite(s) & (s > 1e-6)
    s = jnp.where(ok, s, 1.0)
    R = jnp.where(ok, R, jnp.eye(3, dtype=src.dtype))
    t = jnp.where(ok, t, jnp.zeros(3, src.dtype))
    return s, R, t
