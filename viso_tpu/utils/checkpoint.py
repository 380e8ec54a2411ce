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
