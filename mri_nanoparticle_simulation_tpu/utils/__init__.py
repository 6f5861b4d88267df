from .profiling import Timer, device_trace, walker_steps_per_sec

__all__ = ["Timer", "device_trace", "walker_steps_per_sec"]
