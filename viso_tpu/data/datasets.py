"""Dataset loaders: KITTI odometry, EuRoC MAV, TUM RGB-D, plain image dirs.

TPU-native replacement for the reference's `FrameSequence`
(`/root/reference/include/frame_sequence.h:25-38` — reads
"<location><next_id+1>.png" grayscale each tick and silently stops on a
missing file; `rename.sh` renames arbitrary dirs to 1..N.png). Each
loader yields grayscale float32 frames plus calibration, and ground-truth
poses when the dataset provides them (for ATE/RPE evaluation).

Decoding is host-side (cv2); the high-throughput native path is
viso_tpu.data.native (C++ decoder + prefetch ring).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from viso_tpu.geometry import camera


@dataclass
class Frame:
    index: int
    image: np.ndarray                 # (H, W) float32 grayscale
    image_right: Optional[np.ndarray] = None
    timestamp: float = 0.0


@dataclass
class Sequence:
    frames: "object"                  # iterator of Frame
    intrinsics: camera.Intrinsics
    baseline: float = 0.0             # stereo baseline (m), 0 = monocular
    gt_R: Optional[np.ndarray] = None  # (N, 3, 3) world->cam
    gt_t: Optional[np.ndarray] = None
    name: str = ""


def _imread_gray(path):
    # Prefer the native C++ decoder (no GIL, no OpenCV dependency);
    # fall back to cv2 for formats it doesn't cover (JPEG etc.).
    from viso_tpu.data import native

    if native.available() and path.endswith((".png", ".pgm")):
        img = native.decode_gray(path)
        if img is not None:
            return img
        if not os.path.exists(path):
            return None
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        return None
    return img.astype(np.float32)


def load_image_dir(location: str, start: int = 1) -> Iterator[Frame]:
    """The reference's exact protocol: <location><n>.png for n = start..
    (frame_sequence.h:28-30), silently ending on the first missing file."""
    n = start
    while True:
        img = _imread_gray(os.path.join(location, f"{n}.png"))
        if img is None:
            return
        yield Frame(index=n - start, image=img)
        n += 1


# ---------------------------------------------------------------------------
# KITTI odometry
# ---------------------------------------------------------------------------

def _kitti_calib(seq_dir):
    """Parse calib.txt -> (Intrinsics, baseline) from P0/P1.

    Tolerates the quirks of real KITTI headers — CRLF line endings,
    comment lines, extra cameras (P2/P3) and the `Tr:` velodyne row —
    and fails LOUDLY (ValueError naming the file) on anything malformed
    instead of crashing downstream with a cryptic shape error.
    """
    path = os.path.join(seq_dir, "calib.txt")
    P = {}
    with open(path, newline="") as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()  # handles \r\n and stray whitespace
            if not line or line.startswith("#"):
                continue
            if ":" not in line:
                raise ValueError(
                    f"{path}:{lineno}: expected 'KEY: v0 v1 ...', got {line!r}"
                )
            key, vals = line.split(":", 1)
            key = key.strip()
            try:
                arr = np.array([float(v) for v in vals.split()], np.float64)
            except ValueError as e:
                raise ValueError(f"{path}:{lineno}: non-numeric value ({e})")
            if key.startswith("P"):
                if arr.size != 12:
                    raise ValueError(
                        f"{path}:{lineno}: {key} needs 12 values, got {arr.size}"
                    )
                P[key] = arr.reshape(3, 4)
            # Tr / R0_rect etc. are valid but unused here.
    P0 = P.get("P0")
    if P0 is None:
        raise ValueError(f"{path}: no P0 projection matrix found")
    P1 = P.get("P1")
    fx, fy, cx, cy = P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2]
    if fx <= 0 or fy <= 0:
        raise ValueError(f"{path}: non-positive focal length in P0: {fx}, {fy}")
    baseline = -P1[0, 3] / P1[0, 0] if P1 is not None else 0.0
    return camera.Intrinsics.create(fx, fy, cx, cy), float(baseline)


def _kitti_poses(poses_file):
    """KITTI poses.txt rows are cam->world [R|t]; convert to world->cam."""
    data = np.loadtxt(poses_file).reshape(-1, 3, 4)
    R_wc = data[:, :, :3]   # cam->world rotation
    c = data[:, :, 3]       # camera center in world
    R = np.transpose(R_wc, (0, 2, 1))
    t = -np.einsum("nij,nj->ni", R, c)
    return R.astype(np.float32), t.astype(np.float32)


def load_kitti(
    root: str, sequence: str = "00", stereo: bool = True, max_frames=None
) -> Sequence:
    """KITTI odometry: root/sequences/<seq>/image_0|image_1/*.png.

    Ground truth from root/poses/<seq>.txt when present.
    """
    seq_dir = os.path.join(root, "sequences", sequence)
    intr, baseline = _kitti_calib(seq_dir)
    poses_file = os.path.join(root, "poses", f"{sequence}.txt")
    gt_R = gt_t = None
    if os.path.exists(poses_file):
        gt_R, gt_t = _kitti_poses(poses_file)

    def frames():
        i = 0
        while max_frames is None or i < max_frames:
            left = _imread_gray(
                os.path.join(seq_dir, "image_0", f"{i:06d}.png")
            )
            if left is None:
                return
            right = None
            if stereo:
                right = _imread_gray(
                    os.path.join(seq_dir, "image_1", f"{i:06d}.png")
                )
            yield Frame(index=i, image=left, image_right=right, timestamp=0.1 * i)
            i += 1

    return Sequence(
        frames=frames(),
        intrinsics=intr,
        baseline=baseline if stereo else 0.0,
        gt_R=gt_R,
        gt_t=gt_t,
        name=f"kitti-{sequence}",
    )


# ---------------------------------------------------------------------------
# TUM RGB-D
# ---------------------------------------------------------------------------

TUM_FREIBURG1 = dict(fx=517.3, fy=516.5, cx=325.1, cy=249.7)  # ref main.cpp:14-17
TUM_FREIBURG2 = dict(fx=520.9, fy=521.0, cx=325.1, cy=249.7)
TUM_FREIBURG3 = dict(fx=535.4, fy=539.2, cx=320.1, cy=247.6)


def load_tum(root: str, calib=None, max_frames=None) -> Sequence:
    """TUM RGB-D: root/rgb.txt lists 'timestamp rgb/<ts>.png'.

    Default calibration is the freiburg1 set the reference hard-codes
    (main.cpp:14-17).
    """
    calib = calib or TUM_FREIBURG1
    intr = camera.Intrinsics.create(**calib)
    rgb_list = os.path.join(root, "rgb.txt")
    entries = []
    with open(rgb_list) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            entries.append((float(ts), os.path.join(root, rel)))
    if max_frames is not None:
        entries = entries[:max_frames]

    def frames():
        for i, (ts, path) in enumerate(entries):
            img = _imread_gray(path)
            if img is None:
                continue
            yield Frame(index=i, image=img, timestamp=ts)

    gt_R = gt_t = None
    gt_file = os.path.join(root, "groundtruth.txt")
    if os.path.exists(gt_file):
        gt_R, gt_t = _tum_groundtruth(gt_file, [e[0] for e in entries])
    return Sequence(
        frames=frames(), intrinsics=intr, gt_R=gt_R, gt_t=gt_t, name="tum"
    )


def _tum_groundtruth(path, timestamps):
    """Interpolate TUM groundtruth (tx ty tz qx qy qz qw, cam->world)."""
    from scipy.spatial.transform import Rotation, Slerp

    data = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            data.append(vals)
    data = np.array(data)
    ts = data[:, 0]
    pos = data[:, 1:4]
    quat = data[:, 4:8]
    rot = Rotation.from_quat(quat)
    slerp = Slerp(ts, rot)
    t_query = np.clip(np.asarray(timestamps), ts[0], ts[-1])
    R_wc = slerp(t_query).as_matrix()
    c = np.stack(
        [np.interp(t_query, ts, pos[:, k]) for k in range(3)], axis=-1
    )
    R = np.transpose(R_wc, (0, 2, 1))
    t = -np.einsum("nij,nj->ni", R, c)
    return R.astype(np.float32), t.astype(np.float32)


# ---------------------------------------------------------------------------
# EuRoC MAV
# ---------------------------------------------------------------------------

EUROC_CAM0 = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375)


def _euroc_sensor_yaml(path):
    """Parse a real EuRoC mav0/camX/sensor.yaml -> intrinsics dict.

    Real files carry comments, an opencv-matrix block for T_BS, and
    rate/resolution/distortion fields; only `intrinsics: [fx, fy, cx, cy]`
    is needed here. Fails loudly (ValueError naming the file) when the
    field is missing or malformed.
    """
    import yaml

    with open(path, newline="") as f:
        try:
            doc = yaml.safe_load(f)
        except yaml.YAMLError as e:
            raise ValueError(f"{path}: invalid YAML ({e})")
    if not isinstance(doc, dict) or "intrinsics" not in doc:
        raise ValueError(f"{path}: no `intrinsics` field")
    vals = doc["intrinsics"]
    if not isinstance(vals, (list, tuple)) or len(vals) != 4:
        raise ValueError(
            f"{path}: `intrinsics` must be [fx, fy, cx, cy], got {vals!r}"
        )
    fx, fy, cx, cy = (float(v) for v in vals)
    if fx <= 0 or fy <= 0:
        raise ValueError(f"{path}: non-positive focal length {fx}, {fy}")
    return dict(fx=fx, fy=fy, cx=cx, cy=cy)


def load_euroc(root: str, calib=None, max_frames=None) -> Sequence:
    """EuRoC ASL layout: root/mav0/cam0/data/<ts>.png + data.csv.

    Calibration comes from mav0/cam0/sensor.yaml when present (the real
    dataset always ships it); `calib` overrides, and the published cam0
    values are the last resort. Images are distorted (radtan); for full
    accuracy undistort upstream — the loader exposes raw frames plus the
    pinhole part of the intrinsics.
    """
    if calib is None:
        yaml_path = os.path.join(root, "mav0", "cam0", "sensor.yaml")
        calib = (
            _euroc_sensor_yaml(yaml_path)
            if os.path.exists(yaml_path)
            else EUROC_CAM0
        )
    intr = camera.Intrinsics.create(**calib)
    cam_dir = os.path.join(root, "mav0", "cam0")
    csv = os.path.join(cam_dir, "data.csv")
    entries = []
    with open(csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, fname = line.split(",")[:2]
            entries.append((int(ts) * 1e-9, os.path.join(cam_dir, "data", fname.strip())))
    if max_frames is not None:
        entries = entries[:max_frames]

    def frames():
        for i, (ts, path) in enumerate(entries):
            img = _imread_gray(path)
            if img is None:
                continue
            yield Frame(index=i, image=img, timestamp=ts)

    return Sequence(frames=frames(), intrinsics=intr, name="euroc")
