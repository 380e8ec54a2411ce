"""SLAM engines and loop closure."""

from viso_tpu.slam import engine  # noqa: F401
from viso_tpu.slam.engine import MonocularVO, StereoVO, VOConfig  # noqa: F401
