"""Visualization: debug overlays, trajectory and map rendering.

Replaces the reference's Pangolin 3-D viewer + `cv::imshow` overlays
(`/root/reference/src/main.cpp:24-37,56-103` — white map points, blue
camera frusta from Tcw.inverse(); `src/viso.cpp:56-75,123-135` — keypoint
rectangles during init/tracking). This environment is headless, so all
output is image files / arrays rather than interactive GL windows.
"""

from __future__ import annotations

import numpy as np


def to_rgb(img):
    """Grayscale (H, W) float -> uint8 RGB."""
    g = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def draw_keypoints(img, uv, mask=None, color=(0, 255, 0), radius=2):
    """Draw keypoint squares (the reference draws cv::rectangle overlays,
    viso.cpp:123-135). Returns an RGB uint8 image."""
    rgb = to_rgb(img) if img.ndim == 2 else np.array(img, dtype=np.uint8)
    H, W = rgb.shape[:2]
    uv = np.asarray(uv)
    mask = np.ones(len(uv), bool) if mask is None else np.asarray(mask)
    for (u, v), ok in zip(uv, mask):
        if not ok:
            continue
        u, v = int(round(u)), int(round(v))
        if not (radius <= u < W - radius and radius <= v < H - radius):
            continue
        rgb[v - radius : v + radius + 1, u - radius] = color
        rgb[v - radius : v + radius + 1, u + radius] = color
        rgb[v - radius, u - radius : u + radius + 1] = color
        rgb[v + radius, u - radius : u + radius + 1] = color
    return rgb


def draw_tracks(img, uv0, uv1, mask=None, color=(255, 200, 0)):
    """Draw flow segments from uv0 to uv1 (init overlay, viso.cpp:56-75)."""
    rgb = to_rgb(img) if np.asarray(img).ndim == 2 else np.array(img, np.uint8)
    H, W = rgb.shape[:2]
    uv0 = np.asarray(uv0)
    uv1 = np.asarray(uv1)
    mask = np.ones(len(uv0), bool) if mask is None else np.asarray(mask)
    for (a, b), ok in zip(zip(uv0, uv1), mask):
        if not ok:
            continue
        n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1)) + 1
        us = np.linspace(a[0], b[0], n).round().astype(int)
        vs = np.linspace(a[1], b[1], n).round().astype(int)
        keep = (us >= 0) & (us < W) & (vs >= 0) & (vs < H)
        rgb[vs[keep], us[keep]] = color
    return rgb


def plot_trajectory(est_R, est_t, gt_R=None, gt_t=None, path=None, title=""):
    """Top-down (x-z) trajectory plot; saves PNG if path given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from viso_tpu.utils.metrics import camera_centers

    fig, ax = plt.subplots(figsize=(7, 7))
    c = camera_centers(np.asarray(est_R), np.asarray(est_t))
    ax.plot(c[:, 0], c[:, 2], "b-", lw=1.2, label="estimate")
    if gt_R is not None:
        g = camera_centers(np.asarray(gt_R), np.asarray(gt_t))
        ax.plot(g[:, 0], g[:, 2], "k--", lw=1.0, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    ax.set_title(title)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_map_topdown(points, point_mask, kf_R=None, kf_t=None, path=None):
    """Top-down map scatter + camera frusta markers (main.cpp:56-103)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from viso_tpu.utils.metrics import camera_centers

    fig, ax = plt.subplots(figsize=(7, 7))
    p = np.asarray(points)[np.asarray(point_mask)]
    ax.scatter(p[:, 0], p[:, 2], s=1, c="gray", label="landmarks")
    if kf_R is not None:
        c = camera_centers(np.asarray(kf_R), np.asarray(kf_t))
        ax.plot(c[:, 0], c[:, 2], "b^-", ms=5, label="keyframes")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
