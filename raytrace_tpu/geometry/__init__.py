"""Kerr geometry, tetrads, disc areas — the L0 physics kernel library.

Pure jnp functions mirroring the capability of the reference headers
`src/include/kerr.h`, `src/include/disc.h`, `src/include/gramschmidt_basis.h`.
Everything broadcasts over leading batch dimensions.
"""

from raytrace_tpu.geometry.kerr import (
    horizon_radius,
    isco_radius,
    keplerian_omega,
    bl_to_cartesian,
    metric_coeffs,
    metric_dot,
    orbit_tetrad,
    momentum_from_consts,
    geodesic_rates,
    constants_from_angles,
    constants_from_p,
    circular_orbit_velocity,
    lorentz_factor,
)
from raytrace_tpu.geometry.disc import (
    coordinate_disc_area,
    rel_disc_area,
    plunge_velocity,
    integrate_disc_area,
    integrate_disc_area_bins,
)
from raytrace_tpu.geometry.gramschmidt import gram_schmidt_tetrad

__all__ = [
    "horizon_radius",
    "isco_radius",
    "keplerian_omega",
    "bl_to_cartesian",
    "metric_coeffs",
    "metric_dot",
    "orbit_tetrad",
    "momentum_from_consts",
    "geodesic_rates",
    "constants_from_angles",
    "constants_from_p",
    "circular_orbit_velocity",
    "lorentz_factor",
    "coordinate_disc_area",
    "rel_disc_area",
    "plunge_velocity",
    "integrate_disc_area",
    "integrate_disc_area_bins",
    "gram_schmidt_tetrad",
]
