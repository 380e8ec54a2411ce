"""L0 geometry core: SE3/SO3, pinhole cameras, sampling, triangulation, epipolar."""

from viso_tpu.geometry import se3, camera, sampling, triangulation, epipolar  # noqa: F401
