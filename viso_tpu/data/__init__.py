"""Data ingestion: synthetic scenes and dataset loaders."""

from viso_tpu.data import synthetic  # noqa: F401
