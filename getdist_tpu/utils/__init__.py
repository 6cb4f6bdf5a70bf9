"""Utility helpers: device timing/profiling and dtype policy."""

from getdist_tpu.utils.profiling import device_timer, trace_to

__all__ = ["device_timer", "trace_to"]
