"""Front-end compute kernels: pyramids, detection, tracking, RANSAC."""

from viso_tpu.ops import (  # noqa: F401
    pyramid, fast, lk, ransac, twoview, direct, pnp, stereo, align,
)
