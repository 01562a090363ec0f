"""Windowed video restoration driver (reference L8 orchestration layer)."""

from .video import (
    TaskConfig,
    TASK_CONFIGS,
    restore_video,
    window_slices,
    init_from_degraded,
)
