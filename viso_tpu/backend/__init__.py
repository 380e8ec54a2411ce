"""Optimization backends: bundle adjustment, pose graph, robust kernels."""

from viso_tpu.backend import ba, robust, pose_graph  # noqa: F401
