"""Ray sources (L2): constructors that fill a RayBatch with initial
positions, momenta and constants of motion."""

from raytrace_tpu.sources.pointsource import point_source, PointSourceGrid
from raytrace_tpu.sources.imageplane import image_plane, image_plane_bundles, ImagePlaneGrid
from raytrace_tpu.sources.moving import (
    jet_point_source,
    point_source_vel,
    radial_four_velocity,
)
from raytrace_tpu.sources.healpix_source import healpix_point_source

__all__ = [
    "point_source",
    "PointSourceGrid",
    "image_plane",
    "image_plane_bundles",
    "ImagePlaneGrid",
    "jet_point_source",
    "point_source_vel",
    "radial_four_velocity",
    "healpix_point_source",
]
