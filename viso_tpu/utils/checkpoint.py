"""Checkpoint / resume for map state and trajectories.

The reference keeps everything in RAM only (`/root/reference/include/
map.h:8-9`, `viso.h:54` — SURVEY.md §5 "Checkpoint: None"); restartable
runs are a north-star auxiliary requirement. The SoA MapState is already
a flat dict of arrays, so .npz is a natural, dependency-free format.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from viso_tpu.mapping.map_state import MapState

_FORMAT_VERSION = 1


def save_map(path: str, m: MapState, extra: dict | None = None):
    """Serialize a MapState (+ optional JSON-able metadata) to .npz."""
    arrays = {
        "kf_R": m.kf_R, "kf_t": m.kf_t, "kf_mask": m.kf_mask,
        "kf_frame_id": m.kf_frame_id,
        "points": m.points, "point_mask": m.point_mask,
        "obs_uv": m.obs_uv, "obs_mask": m.obs_mask,
    }
    for lvl, img in enumerate(m.kf_pyr):
        arrays[f"kf_pyr_{lvl}"] = img
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    arrays["_meta"] = np.frombuffer(
        json.dumps(
            {
                "version": _FORMAT_VERSION,
                "num_levels": len(m.kf_pyr),
                "extra": extra or {},
            }
        ).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    # numpy appends .npz to the temp name.
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_map(path: str):
    """Load a MapState checkpoint. Returns (MapState, extra_metadata)."""
    data = np.load(path)
    meta = json.loads(bytes(data["_meta"]).decode())
    assert meta["version"] == _FORMAT_VERSION, meta
    pyr = tuple(
        jnp.asarray(data[f"kf_pyr_{lvl}"]) for lvl in range(meta["num_levels"])
    )
    m = MapState(
        kf_R=jnp.asarray(data["kf_R"]),
        kf_t=jnp.asarray(data["kf_t"]),
        kf_mask=jnp.asarray(data["kf_mask"]),
        kf_frame_id=jnp.asarray(data["kf_frame_id"]),
        kf_pyr=pyr,
        points=jnp.asarray(data["points"]),
        point_mask=jnp.asarray(data["point_mask"]),
        obs_uv=jnp.asarray(data["obs_uv"]),
        obs_mask=jnp.asarray(data["obs_mask"]),
    )
    return m, meta["extra"]


def save_slam(path: str, slam, extra: dict | None = None):
    """Full SLAM checkpoint (StereoSLAM or MonoSLAM): map window + live
    pose + pose graph (+ node scales and edge scale ratios for the mono
    Sim(3) graph) + loop database. `load_slam` resumes a run that keeps
    tracking AND keeps closing loops against pre-checkpoint places.

    Per-frame results recorded before the checkpoint are not stored
    (write the trajectory separately via save_trajectory if needed);
    the resumed engine records from the checkpoint onward.
    """
    slam.join()
    db = slam.loop_db
    arrays = {
        "kf_R": slam.map.kf_R, "kf_t": slam.map.kf_t,
        "kf_mask": slam.map.kf_mask, "kf_frame_id": slam.map.kf_frame_id,
        "points": slam.map.points, "point_mask": slam.map.point_mask,
        "obs_uv": slam.map.obs_uv, "obs_mask": slam.map.obs_mask,
        "R": slam.R, "t": slam.t,
        "prev_R": slam.prev_R, "prev_t": slam.prev_t,
        "vel_xi": slam.vel_xi,
        "pg_raw_R": np.stack(slam.pg_raw_R) if slam.pg_raw_R else np.zeros((0, 3, 3)),
        "pg_raw_t": np.stack(slam.pg_raw_t) if slam.pg_raw_t else np.zeros((0, 3)),
        "pg_R": np.stack(slam.pg_R) if slam.pg_R else np.zeros((0, 3, 3)),
        "pg_t": np.stack(slam.pg_t) if slam.pg_t else np.zeros((0, 3)),
        "pg_frame": np.asarray(slam.pg_frame, np.int64),
        "edge_i": np.asarray([e[0] for e in slam.pg_edges], np.int64),
        "edge_j": np.asarray([e[1] for e in slam.pg_edges], np.int64),
        "edge_R": np.stack([e[2] for e in slam.pg_edges]) if slam.pg_edges else np.zeros((0, 3, 3)),
        "edge_t": np.stack([e[3] for e in slam.pg_edges]) if slam.pg_edges else np.zeros((0, 3)),
        "edge_w": np.asarray([e[-1] for e in slam.pg_edges], np.float32),
        # Loop DB (bf16 descriptors stored as f32 — npz-portable).
        "db_desc": np.asarray(db.desc, np.float32),
        "db_desc_mask": db.desc_mask,
        "db_kp_uv": db.kp_uv, "db_points_w": db.points_w,
        "db_points_ok": db.points_ok, "db_R": db.R, "db_t": db.t,
        "db_frame_id": db.frame_id, "db_node_id": db.node_id,
        "db_path_len": db.path_len, "db_rot_len": db.rot_len,
        "db_seam_t": db.seam_t, "db_seam_r": db.seam_r,
        "db_insert_seq": db.insert_seq,
    }
    mono = hasattr(slam, "pg_s")
    if mono:
        # Sim(3) graph extras: node scales + per-edge scale ratios
        # (mono edges are (i, j, s_ij, R, t, w)).
        arrays["pg_s"] = np.asarray(slam.pg_s, np.float32)
        arrays["edge_s"] = np.asarray(
            [e[2] for e in slam.pg_edges], np.float32
        )
        arrays["edge_R"] = (
            np.stack([e[3] for e in slam.pg_edges])
            if slam.pg_edges else np.zeros((0, 3, 3))
        )
        arrays["edge_t"] = (
            np.stack([e[4] for e in slam.pg_edges])
            if slam.pg_edges else np.zeros((0, 3))
        )
    for lvl, img in enumerate(slam.map.kf_pyr):
        arrays[f"kf_pyr_{lvl}"] = img
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    meta = {
        "version": _FORMAT_VERSION,
        "num_levels": len(slam.map.kf_pyr),
        "frame_idx": slam.frame_idx,
        "last_kf_frame": slam.last_kf_frame,
        "kf_order": list(slam.kf_order),
        "path_len": slam._path_len,
        "rot_len": slam._rot_len,
        "seam_trans": getattr(slam, "_seam_trans", 0.0),
        "seam_rot": getattr(slam, "_seam_rot", 0.0),
        "kind": "mono" if hasattr(slam, "pg_s") else "stereo",
        "db_total": db.total,
        "loops": slam.loops,
        "extra": extra or {},
    }
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_slam(path: str, config, loop_params=None):
    """Restore a StereoSLAM or MonoSLAM from a save_slam checkpoint.

    `config`/`loop_params` must match the capacities the checkpoint was
    written with (static shapes). Returns (slam, extra_metadata).
    """
    from viso_tpu.mapping import map_state as ms
    from viso_tpu.slam.full import StereoSLAM

    data = np.load(path)
    meta = json.loads(bytes(data["_meta"]).decode())
    assert meta["version"] == _FORMAT_VERSION, meta
    mono = meta.get("kind") == "mono"
    if mono:
        from viso_tpu.slam.mono_full import MonoSLAM

        slam = MonoSLAM(config, loop_params)
    else:
        slam = StereoSLAM(config, loop_params)
    pyr = tuple(
        jnp.asarray(data[f"kf_pyr_{lvl}"]) for lvl in range(meta["num_levels"])
    )
    slam.map = ms.MapState(
        kf_R=jnp.asarray(data["kf_R"]), kf_t=jnp.asarray(data["kf_t"]),
        kf_mask=jnp.asarray(data["kf_mask"]),
        kf_frame_id=jnp.asarray(data["kf_frame_id"]), kf_pyr=pyr,
        points=jnp.asarray(data["points"]),
        point_mask=jnp.asarray(data["point_mask"]),
        obs_uv=jnp.asarray(data["obs_uv"]),
        obs_mask=jnp.asarray(data["obs_mask"]),
    )
    slam.R = jnp.asarray(data["R"])
    slam.t = jnp.asarray(data["t"])
    slam.prev_R = jnp.asarray(data["prev_R"])
    slam.prev_t = jnp.asarray(data["prev_t"])
    if "vel_xi" in data:   # absent in pre-r5 checkpoints
        slam.vel_xi = jnp.asarray(data["vel_xi"])
    slam.frame_idx = meta["frame_idx"]
    slam.last_kf_frame = meta["last_kf_frame"]
    slam.kf_order = list(meta["kf_order"])
    slam.state = "tracking" if slam.kf_order else "init"
    slam.pg_raw_R = [r for r in data["pg_raw_R"]]
    slam.pg_raw_t = [t for t in data["pg_raw_t"]]
    slam.pg_R = [r for r in data["pg_R"]]
    slam.pg_t = [t for t in data["pg_t"]]
    slam.pg_frame = list(data["pg_frame"])
    if mono:
        slam.pg_s = [float(s) for s in data["pg_s"]]
        slam.pg_edges = [
            (int(data["edge_i"][k]), int(data["edge_j"][k]),
             float(data["edge_s"][k]), data["edge_R"][k],
             data["edge_t"][k], float(data["edge_w"][k]))
            for k in range(len(data["edge_i"]))
        ]
    slam._seam_trans = meta.get("seam_trans", 0.0)
    slam._seam_rot = meta.get("seam_rot", 0.0)
    if not mono:
        slam.pg_edges = [
            (int(data["edge_i"][k]), int(data["edge_j"][k]),
             data["edge_R"][k], data["edge_t"][k],
             float(data["edge_w"][k]))
            for k in range(len(data["edge_i"]))
        ]
    slam.loops = list(meta["loops"])
    slam._path_len = meta["path_len"]
    slam._rot_len = meta["rot_len"]
    slam._next_node = len(slam.pg_raw_R)
    db = slam.loop_db
    db.desc = jnp.asarray(data["db_desc"], jnp.bfloat16)
    db.desc_mask = jnp.asarray(data["db_desc_mask"])
    db.kp_uv = data["db_kp_uv"].copy()
    db.points_w = data["db_points_w"].copy()
    db.points_ok = data["db_points_ok"].copy()
    # Device mirrors for the fused detect kernel.
    db.points_w_dev = jnp.asarray(db.points_w)
    db.points_ok_dev = jnp.asarray(db.points_ok)
    db.R = data["db_R"].copy()
    db.t = data["db_t"].copy()
    db.frame_id = data["db_frame_id"].copy()
    db.node_id = data["db_node_id"].copy()
    db.path_len = data["db_path_len"].copy()
    db.rot_len = data["db_rot_len"].copy()
    if "db_seam_t" in data:
        db.seam_t = data["db_seam_t"].copy()
        db.seam_r = data["db_seam_r"].copy()
    db.insert_seq = data["db_insert_seq"].copy()
    db.total = meta["db_total"]
    if slam.kf_order:
        slam._refresh_templates(slam.kf_order[-1])
    return slam, meta["extra"]


def save_trajectory(path: str, R, t, fmt: str = "kitti"):
    """Write a trajectory in KITTI format (cam->world [R|t] rows)."""
    R = np.asarray(R)
    t = np.asarray(t)
    rows = []
    for k in range(len(R)):
        R_wc = R[k].T
        c = -R[k].T @ t[k]
        P = np.concatenate([R_wc, c[:, None]], axis=1)
        rows.append(" ".join(f"{v:.9e}" for v in P.reshape(-1)))
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def load_trajectory(path: str):
    """Read a KITTI-format trajectory -> (R, t) world->cam."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    R_wc = data[:, :, :3]
    c = data[:, :, 3]
    R = np.transpose(R_wc, (0, 2, 1))
    t = -np.einsum("nij,nj->ni", R, c)
    return R.astype(np.float32), t.astype(np.float32)
