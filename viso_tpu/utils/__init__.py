"""Utilities: metrics, checkpointing, logging, profiling."""

from viso_tpu.utils import metrics, checkpoint, logging, profiling  # noqa: F401
