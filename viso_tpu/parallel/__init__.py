"""Multi-device execution: meshes, sharded bundle adjustment."""

from viso_tpu.parallel import mesh, dist_ba  # noqa: F401
