"""Utilities: checkpoint/resume (orbax) and profiling/phase timing."""

from gogp_tpu.utils.checkpoint import restore, save
from gogp_tpu.utils.profiling import PhaseTimer, device_trace, timed

__all__ = ["PhaseTimer", "device_trace", "restore", "save", "timed"]
