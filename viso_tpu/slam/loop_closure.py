"""Loop-closure detection and pose-graph correction.

No reference counterpart (SURVEY.md §2 — the reference has neither
descriptors nor a pose graph); this implements the north-star loop
pipeline (BASELINE.json config 4):

  1. Every keyframe contributes a fixed-size BRIEF descriptor set to a
     fixed-capacity database (SoA, so candidate scoring against ALL
     stored keyframes is one big MXU matmul batch).
  2. Candidates = keyframes (outside a temporal guard window) whose
     descriptor match count clears a threshold.
  3. Geometric verification: PnP RANSAC of the candidate keyframe's
     stored 3-D landmarks against the current keyframe's matched 2-D
     features -> relative pose measurement.
  4. The verified edge joins the pose graph; backend/pose_graph.solve
     redistributes the drift.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.geometry import camera as cam_mod
from viso_tpu.geometry import se3
from viso_tpu.ops import descriptors, pnp


@dataclass
class LoopParams:
    capacity: int = 256            # stored keyframes
    num_features: int = 256        # descriptors per keyframe
    guard: int = 30                # skip this many most-recent keyframes
    min_matches: int = 40          # descriptor matches to be a candidate
    min_inliers: int = 25          # PnP inliers to accept
    # Reprojection gate in PIXELS (normalized per-camera at detect time):
    # independently re-detected FAST corners land 1-2 px apart across
    # views, so this must be looser than the tracking gates.
    pnp_threshold_px: float = 4.0


class LoopCandidate(NamedTuple):
    db_index: int
    matches: int
    inliers: int
    R_rel: np.ndarray   # measured T_cur * T_cand^-1
    t_rel: np.ndarray


class LoopDatabase:
    """Fixed-capacity store of keyframe descriptor sets + geometry."""

    def __init__(self, params: LoopParams, seed: int = 0):
        p = params
        self.params = p
        self.desc = jnp.zeros(
            (p.capacity, p.num_features, descriptors.DESC_BITS), jnp.bfloat16
        )
        self.desc_mask = jnp.zeros((p.capacity, p.num_features), bool)
        self.kp_uv = np.zeros((p.capacity, p.num_features, 2), np.float32)
        self.points_w = np.zeros((p.capacity, p.num_features, 3), np.float32)
        self.points_ok = np.zeros((p.capacity, p.num_features), bool)
        self.R = np.zeros((p.capacity, 3, 3), np.float32)
        self.t = np.zeros((p.capacity, 3), np.float32)
        self.frame_id = np.full(p.capacity, -1, np.int64)
        self.count = 0
        self.key = jax.random.PRNGKey(seed)

    def add(self, img_smooth, kps, kp_mask, points_w, points_ok, R, t, frame_id):
        """Store a keyframe: descriptors at `kps`, its pose, and the 3-D
        landmarks associated with those keypoints (points_ok marks which)."""
        if self.count >= self.params.capacity:
            return -1  # full: stop adding (bounded memory)
        i = self.count
        desc = descriptors.compute(img_smooth, kps, kp_mask)
        self.desc = self.desc.at[i].set(desc)
        self.desc_mask = self.desc_mask.at[i].set(kp_mask)
        self.kp_uv[i] = np.asarray(kps)
        self.points_w[i] = np.asarray(points_w)
        self.points_ok[i] = np.asarray(points_ok)
        self.R[i] = np.asarray(R)
        self.t[i] = np.asarray(t)
        self.frame_id[i] = frame_id
        self.count += 1
        return i

    def detect(self, img_smooth, kps, kp_mask, R_cur, t_cur, intr) -> Optional[LoopCandidate]:
        """Look for a verified loop closure for the current keyframe."""
        p = self.params
        n_eligible = self.count - p.guard
        if n_eligible <= 0:
            return None
        desc_q = descriptors.compute(img_smooth, kps, kp_mask)
        # Score all eligible stored keyframes (vmapped matmul matching).
        counts = _match_counts(
            desc_q, kp_mask, self.desc[:n_eligible], self.desc_mask[:n_eligible]
        )
        counts = np.asarray(counts)
        best = int(np.argmax(counts))
        if counts[best] < p.min_matches:
            return None
        # Geometric verification: candidate's 3-D landmarks vs our 2-D kps.
        idx2, dist, ok = descriptors.match(
            desc_q, kp_mask, self.desc[best], self.desc_mask[best]
        )
        idx2 = np.asarray(idx2)
        ok = np.asarray(ok) & self.points_ok[best][idx2]
        if ok.sum() < p.min_inliers:
            return None
        pts3d = jnp.asarray(self.points_w[best][idx2])
        x = cam_mod.normalize(jnp.asarray(kps), intr)
        self.key, sub = jax.random.split(self.key)
        thresh = (p.pnp_threshold_px / float(intr.fx)) ** 2
        res = pnp.pnp_ransac(
            sub, pts3d, x, jnp.asarray(ok), threshold=thresh
        )
        n_inl = int(res.num_inliers)
        if n_inl < p.min_inliers:
            return None
        # res.(R, t) is the verified current-keyframe pose in world frame
        # (from the candidate's landmarks); the relative edge measurement:
        R_meas, t_meas = np.asarray(res.R), np.asarray(res.t)
        R_rel, t_rel = se3.relative(
            jnp.asarray(R_meas), jnp.asarray(t_meas),
            jnp.asarray(self.R[best]), jnp.asarray(self.t[best]),
        )
        return LoopCandidate(
            db_index=best,
            matches=int(counts[best]),
            inliers=n_inl,
            R_rel=np.asarray(R_rel),
            t_rel=np.asarray(t_rel),
        )


@jax.jit
def _match_counts(desc_q, mask_q, desc_db, mask_db):
    """Number of mutual ratio-test matches against each stored keyframe."""

    def one(desc_k, mask_k):
        _, _, ok = descriptors.match(desc_q, mask_q, desc_k, mask_k)
        return jnp.sum(ok)

    return jax.vmap(one)(desc_db, mask_db)
