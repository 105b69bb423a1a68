"""Multi-chip SPMD over the ray batch (the workload's only parallel axis)."""

from raytrace_tpu.parallel.sharding import (
    make_ray_mesh,
    auto_mesh,
    pad_rays,
    shard_rays,
    sharded_trace,
    sharded_disc_image,
    sharded_caustic_trace,
    sharded_emissivity_bins,
    sharded_emissivity_gradient,
    sharded_line_profile_fit_step,
)

__all__ = [
    "make_ray_mesh",
    "auto_mesh",
    "pad_rays",
    "shard_rays",
    "sharded_trace",
    "sharded_disc_image",
    "sharded_caustic_trace",
    "sharded_emissivity_bins",
    "sharded_emissivity_gradient",
    "sharded_line_profile_fit_step",
]
