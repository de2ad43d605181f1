from .timing import Timer, DeviceBench
from .prof import profile_trace

__all__ = ["Timer", "DeviceBench", "profile_trace"]
