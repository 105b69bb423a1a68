"""Integrator cores and on-device reductions (L1)."""

from raytrace_tpu.ops.integrate import (
    StepControl,
    trace,
    trace_compacted,
    STEPLIM,
    RK45_STEPLIM,
)
from raytrace_tpu.ops.reductions import radial_bin_profile, pixel_accumulate

__all__ = [
    "StepControl",
    "trace",
    "trace_compacted",
    "STEPLIM",
    "RK45_STEPLIM",
    "radial_bin_profile",
    "pixel_accumulate",
]
