"""SLAM engines and loop closure."""

from viso_tpu.slam import engine  # noqa: F401
from viso_tpu.slam.engine import MonocularVO, StereoVO, VOConfig  # noqa: F401


def __getattr__(name):
    # Lazy: the SLAM layers pull in the loop/pose-graph stack.
    if name == "StereoSLAM":
        from viso_tpu.slam.full import StereoSLAM

        return StereoSLAM
    if name == "MonoSLAM":
        from viso_tpu.slam.mono_full import MonoSLAM

        return MonoSLAM
    if name in ("LoopDatabase", "LoopParams"):
        from viso_tpu.slam import loop_closure

        return getattr(loop_closure, name)
    raise AttributeError(name)
