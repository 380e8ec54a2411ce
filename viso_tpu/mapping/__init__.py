"""SoA map state (keyframes, landmarks, observations)."""

from viso_tpu.mapping import map_state  # noqa: F401
from viso_tpu.mapping.map_state import MapState  # noqa: F401
