"""Stereo matching along rectified epipolar lines.

The reference is monocular-only; stereo VO (BASELINE.json config 2)
needs per-feature disparity. TPU-native design: for N keypoints and D
candidate disparities, sample all (N, D) patch SSDs in one fused gather
batch (no per-feature loops), argmin over D, then sub-pixel refine with
a parabola fit on the SSD curve — everything static-shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viso_tpu.geometry import sampling


class StereoParams(NamedTuple):
    max_disparity: int = 128
    half_patch: int = 4
    # Maximum acceptable mean SSD per pixel for a valid match.
    max_cost: float = 400.0
    min_disparity: float = 0.25   # sub-pixel disparities below are unusable


@partial(jax.jit, static_argnames=("params",))
def match(img_left, img_right, kp_left, mask, params: StereoParams = StereoParams()):
    """Match left-image keypoints into the right image (rectified pair).

    kp_left: (N, 2) pixel coords in the left image.
    Returns (disparity (N,), cost (N,), ok (N,)).
    Depth follows as  z = f * baseline / disparity.
    """
    half = params.half_patch
    D = params.max_disparity
    offs = sampling.patch_offsets(half, dtype=kp_left.dtype)          # (P,P,2)
    uv_l = kp_left[:, None, None, :] + offs[None]                      # (N,P,P,2)
    tmpl = sampling.bilinear(img_left, uv_l)                           # (N,P,P)
    # Candidate disparities 0..D-1 (right features shift left).
    d_range = jnp.arange(D, dtype=kp_left.dtype)                       # (D,)
    uv_r = uv_l[:, None] - jnp.stack(
        [d_range, jnp.zeros_like(d_range)], axis=-1
    )[None, :, None, None, :]                                          # (N,D,P,P,2)
    cand = sampling.bilinear(img_right, uv_r)                          # (N,D,P,P)
    ssd = jnp.mean((cand - tmpl[:, None]) ** 2, axis=(-1, -2))         # (N,D)
    # Invalidate disparities that push the patch out of the image.
    u = kp_left[:, 0]
    valid_d = (u[:, None] - d_range[None, :]) >= (half + 1)
    ssd = jnp.where(valid_d, ssd, jnp.inf)
    best = jnp.argmin(ssd, axis=-1)                                    # (N,)
    best_cost = jnp.take_along_axis(ssd, best[:, None], axis=-1)[:, 0]
    # Sub-pixel parabola fit around the minimum.
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    c0 = jnp.take_along_axis(ssd, bm1[:, None], axis=-1)[:, 0]
    c2 = jnp.take_along_axis(ssd, bp1[:, None], axis=-1)[:, 0]
    c1 = best_cost
    denom = c0 - 2 * c1 + c2
    delta = jnp.where(
        (jnp.abs(denom) > 1e-9) & jnp.isfinite(c0) & jnp.isfinite(c2),
        0.5 * (c0 - c2) / jnp.maximum(denom, 1e-9),
        0.0,
    )
    delta = jnp.clip(delta, -1.0, 1.0)
    disparity = best.astype(kp_left.dtype) + delta
    ok = (
        mask
        & jnp.isfinite(best_cost)
        & (best_cost < params.max_cost)
        & (disparity > params.min_disparity)
        & (best > 0)
        & (best < D - 1)
    )
    return disparity, best_cost, ok


def disparity_to_depth(disparity, focal, baseline, ok=None):
    """z = f b / d; masked entries get depth 0."""
    d = jnp.maximum(disparity, 1e-6)
    z = focal * baseline / d
    if ok is not None:
        z = jnp.where(ok, z, 0.0)
    return z
