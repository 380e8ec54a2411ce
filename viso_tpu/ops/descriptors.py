"""BRIEF binary descriptors and MXU-based Hamming matching.

The reference has no descriptors (its association is pure LK tracking);
the north star requires "descriptor matching as batched Pallas/MXU
kernels" for stereo/loop-closure association. Design:

  * BRIEF-256: fixed random pixel-pair pattern in a smoothed patch;
    one fused gather evaluates all N keypoints x 256 pairs at once.
  * Descriptors are stored as {-1, +1} bfloat16 vectors: Hamming distance
    becomes  (D - a.b) / 2,  so brute-force matching of (N1, 256) x
    (N2, 256) is a single MXU matmul — the speed-of-light way to match
    on TPU (vs bit-packed popcount loops on scalar units).
  * Mutual-nearest + ratio-test matching, all masked/static-shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import sampling

DESC_BITS = 256
_PATCH_RADIUS = 15.0


def _brief_pattern(seed: int = 17):
    """(256, 2, 2) sample-pair offsets, Gaussian like the BRIEF paper."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH_RADIUS / 2.0, size=(DESC_BITS, 2, 2))
    return np.clip(pts, -_PATCH_RADIUS, _PATCH_RADIUS).astype(np.float32)


_PATTERN = jnp.asarray(_brief_pattern())


@jax.jit
def compute(img_smooth, kps, mask):
    """BRIEF descriptors for keypoints.

    img_smooth: (H, W) pre-smoothed image (use pyramid level 0 blurred —
    level 1 of the pyramid upsampled is fine too).
    kps: (N, 2); mask: (N,).
    Returns desc (N, 256) bfloat16 in {-1, +1} (0 rows where masked).
    """
    pat = _PATTERN  # (256, 2, 2)
    uv = kps[:, None, None, :] + pat[None]  # (N, 256, 2, 2)
    vals = sampling.bilinear(img_smooth, uv)  # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1])
    desc = jnp.where(bits, 1.0, -1.0).astype(jnp.bfloat16)
    return desc * mask[:, None].astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=())
def hamming(desc1, desc2):
    """Pairwise Hamming distances (N1, N2) via one MXU matmul."""
    dot = jnp.dot(
        desc1, desc2.T, preferred_element_type=jnp.float32
    )
    return (DESC_BITS - dot) * 0.5


@jax.jit
def match(desc1, mask1, desc2, mask2, max_distance=64.0, ratio=0.8):
    """Mutual-nearest matching with Lowe ratio test.

    Returns (idx2 (N1,), dist (N1,), ok (N1,)): for each descriptor in
    set 1, its match index in set 2.
    """
    d = hamming(desc1, desc2)
    big = jnp.asarray(1e9, d.dtype)
    d = jnp.where(mask1[:, None] & mask2[None, :], d, big)
    # Best and second-best along set 2.
    best2 = jnp.argmin(d, axis=1)
    dbest = jnp.min(d, axis=1)
    d_wo = d.at[jnp.arange(d.shape[0]), best2].set(big)
    dsecond = jnp.min(d_wo, axis=1)
    # Mutual check.
    best1_of_2 = jnp.argmin(d, axis=0)
    mutual = best1_of_2[best2] == jnp.arange(d.shape[0])
    ok = (
        mask1
        & mutual
        & (dbest < max_distance)
        & (dbest < ratio * dsecond)
    )
    return best2, dbest, ok
