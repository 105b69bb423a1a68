"""Ray sources (L2): constructors that fill a RayBatch with initial
positions, momenta and constants of motion."""

from raytrace_tpu.sources.pointsource import (
    grid_angles,
    point_source,
    point_source_from_angles,
    PointSourceGrid,
)
from raytrace_tpu.sources.imageplane import image_plane, image_plane_bundles, ImagePlaneGrid
from raytrace_tpu.sources.moving import (
    jet_point_source,
    point_source_vel,
    radial_four_velocity,
)
from raytrace_tpu.sources.healpix_source import healpix_point_source

__all__ = [
    "grid_angles",
    "point_source",
    "point_source_from_angles",
    "PointSourceGrid",
    "image_plane",
    "image_plane_bundles",
    "ImagePlaneGrid",
    "jet_point_source",
    "point_source_vel",
    "radial_four_velocity",
    "healpix_point_source",
]
