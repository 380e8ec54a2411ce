"""Full stereo SLAM: VO + loop closure + pose-graph correction.

BASELINE.json config 4 ("full stereo SLAM with loop closure + pose-graph
optimization"). No reference counterpart exists (SURVEY.md §2) — the
reference never had a backend at all.

On every keyframe: BRIEF descriptors of the keyframe's landmark
observations go into the LoopDatabase; a sequential odometry edge joins
the persistent pose graph. When a verified loop candidate appears, the
loop edge is added, the pose graph is re-optimized, and the resulting
correction of the newest node is propagated to the live window
(keyframe poses, landmarks, current camera).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from viso_tpu.backend import pose_graph
from viso_tpu.geometry import se3
from viso_tpu.slam.engine import StereoVO, VOConfig
from viso_tpu.slam.loop_closure import LoopDatabase, LoopParams


class StereoSLAM(StereoVO):
    def __init__(self, config: VOConfig, loop_params: LoopParams | None = None):
        super().__init__(config)
        self.loop_params = loop_params or LoopParams()
        self.loop_db = LoopDatabase(self.loop_params, seed=config.seed + 1)
        # Persistent pose graph over ALL keyframes (beyond the window).
        self.pg_R: list[np.ndarray] = []
        self.pg_t: list[np.ndarray] = []
        self.pg_frame: list[int] = []
        self.pg_edges: list[tuple] = []   # (i, j, R_ij, t_ij, weight)
        self.loops: list[dict] = []
        # World-frame epochs: every pose-graph correction re-maps world
        # points (p_new = G p_old). _epoch_maps[e] accumulates the map
        # from epoch-e world to the CURRENT world so trajectory() can
        # express every recorded frame in one consistent frame.
        self._epoch = 0
        self._epoch_maps = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]

    # Hook keyframe creation.
    def _insert_stereo_keyframe(self, pyr, img_left, img_right, existing_obs=None):
        slot = super()._insert_stereo_keyframe(
            pyr, img_left, img_right, existing_obs
        )
        self._on_new_keyframe(slot, pyr)
        return slot

    def _on_new_keyframe(self, slot, pyr):
        p = self.loop_params
        m = self.map
        R_np = np.asarray(self.R)
        t_np = np.asarray(self.t)

        # Pose-graph node + sequential edge.
        node_id = len(self.pg_R)
        self.pg_R.append(R_np.copy())
        self.pg_t.append(t_np.copy())
        self.pg_frame.append(self.frame_idx)
        if node_id > 0:
            # Edge (i, j) carries T_ij := T_i o T_j^-1 — the convention
            # backend/pose_graph.edge_residual expects.
            R_rel, t_rel = se3.relative(
                jnp.asarray(self.pg_R[node_id - 1]),
                jnp.asarray(self.pg_t[node_id - 1]),
                jnp.asarray(R_np), jnp.asarray(t_np),
            )
            self.pg_edges.append(
                (node_id - 1, node_id, np.asarray(R_rel), np.asarray(t_rel), 1.0)
            )

        # Database entry: this keyframe's landmark observations.
        obs_mask = np.asarray(m.obs_mask[slot])
        obs_uv = np.asarray(m.obs_uv[slot])
        pts = np.asarray(m.points)
        idx = np.nonzero(obs_mask)[0][: p.num_features]
        n = len(idx)
        kps = np.zeros((p.num_features, 2), np.float32)
        kp_mask = np.zeros(p.num_features, bool)
        points_w = np.zeros((p.num_features, 3), np.float32)
        points_ok = np.zeros(p.num_features, bool)
        kps[:n] = obs_uv[idx]
        kp_mask[:n] = True
        points_w[:n] = pts[idx]
        points_ok[:n] = True
        self.loop_db.add(
            pyr[0], jnp.asarray(kps), jnp.asarray(kp_mask),
            points_w, points_ok, R_np, t_np, self.frame_idx,
            node_id=node_id,
        )

        # Loop detection for this keyframe.
        cand = self.loop_db.detect(
            pyr[0], jnp.asarray(kps), jnp.asarray(kp_mask),
            R_np, t_np, self.intr,
        )
        if cand is not None:
            # cand.R_rel is T_cur o T_cand^-1; the (cand -> cur) edge
            # needs T_cand o T_cur^-1 — invert it.
            R_e, t_e = map(
                np.asarray,
                se3.inverse(jnp.asarray(cand.R_rel), jnp.asarray(cand.t_rel)),
            )
            self.pg_edges.append(
                (cand.db_index, node_id, R_e, t_e, float(cand.inliers))
            )
            self.loops.append(
                {"from": node_id, "to": cand.db_index,
                 "frame": self.frame_idx, "inliers": cand.inliers}
            )
            self._optimize_pose_graph()

    def _optimize_pose_graph(self):
        K = len(self.pg_R)
        if K < 3 or not self.pg_edges:
            return
        out, info = pose_graph.solve_padded(
            self.pg_R, self.pg_t, self.pg_edges,
            pose_graph.PGParams(iters=25),
        )
        R_new = np.asarray(out.R)[:K]
        t_new = np.asarray(out.t)[:K]

        # World correction from the newest node: G = T_new^-1 T_old maps
        # old-world coords to new-world coords consistently with the
        # corrected camera.
        last = K - 1
        T_old = (jnp.asarray(self.pg_R[last]), jnp.asarray(self.pg_t[last]))
        T_new = (jnp.asarray(R_new[last]), jnp.asarray(t_new[last]))
        G = se3.compose(*se3.inverse(*T_new), *T_old)
        G_inv = se3.inverse(*G)

        # Update stored graph.
        self.pg_R = [R_new[k].copy() for k in range(K)]
        self.pg_t = [t_new[k].copy() for k in range(K)]

        # Propagate to the live window: p_new = G p_old; T_kf_new = T_kf_old G^-1.
        m = self.map
        pts_new = se3.transform(G[0], G[1], m.points)
        kf_R_new = jnp.einsum("kij,jl->kil", m.kf_R, G_inv[0])
        kf_t_new = jnp.einsum("kij,j->ki", m.kf_R, G_inv[1]) + m.kf_t
        self.map = m._replace(
            points=jnp.where(m.point_mask[:, None], pts_new, m.points),
            kf_R=jnp.where(m.kf_mask[:, None, None], kf_R_new, m.kf_R),
            kf_t=jnp.where(m.kf_mask[:, None], kf_t_new, m.kf_t),
        )
        R_cur, t_cur = se3.compose(self.R, self.t, *G_inv)
        self.R, self.t = R_cur, t_cur
        self.prev_R, self.prev_t = self.R, self.t

        # Advance the world epoch: fold G into every earlier epoch's
        # accumulated map, then open a fresh (identity) epoch.
        G_R_np, G_t_np = np.asarray(G[0]), np.asarray(G[1])
        self._epoch_maps = [
            (G_R_np @ M_R, G_R_np @ M_t + G_t_np)
            for (M_R, M_t) in self._epoch_maps
        ]
        self._epoch_maps.append(
            (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        )
        self._epoch += 1

        # Loop-closure DB geometry must follow the corrected world too.
        db = self.loop_db
        n = db.count
        if n:
            G_R, G_t = np.asarray(G[0]), np.asarray(G[1])
            Gi_R, Gi_t = np.asarray(G_inv[0]), np.asarray(G_inv[1])
            db.points_w[:n] = db.points_w[:n] @ G_R.T + G_t
            R_old = db.R[:n].copy()
            db.R[:n] = np.einsum("kij,jl->kil", R_old, Gi_R)
            db.t[:n] = np.einsum("kij,j->ki", R_old, Gi_t) + db.t[:n]

    def graph_trajectory(self):
        """Keyframe trajectory after pose-graph corrections."""
        return np.stack(self.pg_R), np.stack(self.pg_t), list(self.pg_frame)
