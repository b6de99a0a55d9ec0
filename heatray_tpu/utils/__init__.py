"""Utility layer: logging, timing, AABB helpers, camera auto-framing.

Replaces the reference's ``Source/Utility/`` host utilities (``Log.h``,
``Timer.h``, ``AABB.h``) with Python equivalents; compute-path utilities
(QMC, blue noise, hashes) live in ``sampling/``.
"""

from .log import get_logger, install_ring_buffer_handler
from .timing import Timer, RenderTimers
from .framing import frame_scene

__all__ = [
    "get_logger",
    "install_ring_buffer_handler",
    "Timer",
    "RenderTimers",
    "frame_scene",
]
