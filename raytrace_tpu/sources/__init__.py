"""Ray sources (L2): constructors that fill a RayBatch with initial
positions, momenta and constants of motion."""

from raytrace_tpu.sources.pointsource import point_source, PointSourceGrid
from raytrace_tpu.sources.imageplane import image_plane, image_plane_bundles, ImagePlaneGrid

__all__ = [
    "point_source",
    "PointSourceGrid",
    "image_plane",
    "image_plane_bundles",
    "ImagePlaneGrid",
]
