"""Run utilities: checkpointing, profiling, progress."""

from raytrace_tpu.utils.checkpoint import load_rays, save_rays
from raytrace_tpu.utils.profiling import profile_trace

__all__ = ["save_rays", "load_rays", "profile_trace"]
