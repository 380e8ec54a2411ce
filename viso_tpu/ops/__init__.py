"""Front-end compute kernels: pyramids, detection, tracking, RANSAC."""

from viso_tpu.ops import pyramid, fast, lk, ransac, twoview  # noqa: F401
