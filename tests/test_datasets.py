"""Dataset loader tests against generated on-disk mini-datasets."""

import os

import numpy as np
import pytest

from viso_tpu.data import datasets


def _write_png(path, img):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img.astype(np.uint8))


def make_mini_kitti(root, rng, n=4):
    seq = os.path.join(root, "sequences", "03")
    for i in range(n):
        img = rng.integers(0, 255, (60, 120))
        _write_png(os.path.join(seq, "image_0", f"{i:06d}.png"), img)
        _write_png(os.path.join(seq, "image_1", f"{i:06d}.png"), img)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write(
            "P0: 700.0 0 60.0 0 0 700.0 30.0 0 0 0 1 0\n"
            "P1: 700.0 0 60.0 -375.0 0 700.0 30.0 0 0 0 1 0\n"
        )
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    rows = []
    for i in range(n):
        rows.append(
            f"1 0 0 {0.5 * i} 0 1 0 0 0 0 1 {1.0 * i}"
        )
    with open(os.path.join(root, "poses", "03.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


def test_kitti_loader(tmp_path, rng):
    make_mini_kitti(str(tmp_path), rng)
    seq = datasets.load_kitti(str(tmp_path), "03", stereo=True)
    assert abs(float(seq.intrinsics.fx) - 700.0) < 1e-6
    assert abs(seq.baseline - 375.0 / 700.0) < 1e-6
    frames = list(seq.frames)
    assert len(frames) == 4
    assert frames[0].image.shape == (60, 120)
    assert frames[0].image_right is not None
    # Ground truth: camera centers at (0.5i, 0, i); world->cam t = -R^T... R=I.
    assert seq.gt_R.shape == (4, 3, 3)
    c = -np.einsum("nji,nj->ni", seq.gt_R, seq.gt_t)
    assert np.allclose(c[:, 0], [0, 0.5, 1.0, 1.5], atol=1e-5)
    assert np.allclose(c[:, 2], [0, 1, 2, 3], atol=1e-5)


def test_image_dir_protocol(tmp_path, rng):
    # The reference's exact "<dir><n>.png" protocol (frame_sequence.h:28).
    for n in (1, 2, 3):
        _write_png(os.path.join(str(tmp_path), f"{n}.png"), rng.integers(0, 255, (32, 40)))
    frames = list(datasets.load_image_dir(str(tmp_path) + os.sep))
    assert len(frames) == 3
    assert frames[0].image.shape == (32, 40)


def test_tum_loader(tmp_path, rng):
    root = str(tmp_path)
    entries = []
    for i in range(3):
        ts = 1000.0 + 0.1 * i
        rel = f"rgb/{ts:.6f}.png"
        _write_png(os.path.join(root, rel), rng.integers(0, 255, (24, 32)))
        entries.append(f"{ts:.6f} {rel}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# comment\n" + "\n".join(entries) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n")
        for i in range(5):
            ts = 999.9 + 0.1 * i
            f.write(f"{ts:.6f} {0.1 * i} 0 0 0 0 0 1\n")
    seq = datasets.load_tum(root, max_frames=3)
    frames = list(seq.frames)
    assert len(frames) == 3
    assert seq.gt_R is not None and len(seq.gt_R) == 3
    # gt x = 0.1*i at ts = 999.9 + 0.1 i; frames are at ts 1000.0/.1/.2.
    c = -np.einsum("nji,nj->ni", seq.gt_R, seq.gt_t)
    assert np.allclose(c[:, 0], [0.1, 0.2, 0.3], atol=1e-5)


def test_euroc_loader(tmp_path, rng):
    cam = os.path.join(str(tmp_path), "mav0", "cam0")
    entries = []
    for i in range(3):
        ts = 1403636579763555584 + i * 50000000
        _write_png(os.path.join(cam, "data", f"{ts}.png"), rng.integers(0, 255, (24, 32)))
        entries.append(f"{ts},{ts}.png")
    with open(os.path.join(cam, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n" + "\n".join(entries) + "\n")
    seq = datasets.load_euroc(str(tmp_path))
    frames = list(seq.frames)
    assert len(frames) == 3
    assert frames[1].timestamp > frames[0].timestamp
