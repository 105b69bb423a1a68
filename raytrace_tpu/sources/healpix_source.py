"""HEALPix point source: solid-angle-uniform emission with corner bundles.

Capability of the reference's bitrotted HealpixPointSource
(src/raytracer/healpix_pointsource.cpp): 5 rays per HEALPix pixel (centre +
4 corners) so each pixel carries an exactly equal solid angle and the
corner rays measure the solid-angle distortion of the bundle along the way
— the basis for solid-angle-correct illumination fractions. Supports a
static, azimuthally orbiting, or radially moving source frame and the
disc-source mode that masks the upward hemisphere
(healpix_pointsource.h:39-43).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.geometry.gramschmidt import gram_schmidt_tetrad
from raytrace_tpu.geometry.healpix import n_pixels, pixel_vectors
from raytrace_tpu.geometry.kerr import (
    constants_from_frame,
    metric_coeffs,
    orbit_tetrad,
    Tetrad,
)
from raytrace_tpu.rays import RayBatch, blank_batch
from raytrace_tpu.sources.moving import radial_four_velocity


def healpix_point_source(
    pos,
    spin,
    order: int = 3,
    V=0.0,
    v_radial=None,
    disc_source: bool = False,
    basis: int = 0,
    E=1.0,
    dtype=jnp.float64,
) -> tuple[RayBatch, int]:
    """Build the 5 x npix ray batch.

    Ray layout: slot-major [centre, c0, c1, c2, c3] x pixels (slot *
    npix + pix), mirroring the image-plane bundle layout. Returns
    (rays, npix).

    Args:
      V: source azimuthal angular velocity (ignored if v_radial given).
      v_radial: if set, the source moves radially at dr/dt = v_radial.
      disc_source: emit only into the hemisphere above the disc (the lower
        half-space is inside the opaque disc) — the reference's
        set_disc_source() mode for returning-radiation sources
        (healpix_pointsource.h:39-43).
    """
    npix = n_pixels(order)
    corners, centres = pixel_vectors(order)  # numpy [npix,4,3], [npix,3]
    vecs = np.concatenate([centres[None, :, :], np.moveaxis(corners, 1, 0)], axis=0)
    vecs = vecs.reshape(-1, 3)  # [5*npix, 3] slot-major
    vx = jnp.asarray(vecs[:, 0], dtype=dtype)
    vy = jnp.asarray(vecs[:, 1], dtype=dtype)
    vz = jnp.asarray(vecs[:, 2], dtype=dtype)
    if basis == 1:
        # alternate frame orientation (healpix_pointsource.cpp basis=1):
        # local y drives the (negated) radial leg, local z the theta leg
        vx, vy, vz = vx, vz, -vy

    t0, r0, th0, ph0 = (jnp.asarray(p, dtype=dtype) for p in pos)
    if v_radial is not None:
        u4 = radial_four_velocity(r0, th0, jnp.asarray(v_radial, dtype=dtype), spin)
        tet = gram_schmidt_tetrad(r0, th0, u4, spin)
    else:
        tet = orbit_tetrad(r0, th0, spin, jnp.asarray(V, dtype=dtype))
        # match the reference's negative-theta e2 orientation
        tet = Tetrad(
            et=tet.et,
            ephi=tet.ephi,
            etheta=tuple(-c for c in tet.etheta),
            er=tet.er,
        )

    n = 5 * npix
    r = jnp.full((n,), 1.0, dtype=dtype) * r0
    theta = jnp.full((n,), 1.0, dtype=dtype) * th0
    c = constants_from_frame(r, theta, tet, vx, vy, vz, spin, E)

    # healpix local frame: (x, y, z) -> (phi-leg, theta-leg, r-leg). The
    # theta-leg is -theta oriented, so local vy > 0 moves towards smaller
    # theta, i.e. up and away from the equatorial disc plane; a disc
    # source keeps only those rays.
    dead = jnp.zeros((n,), dtype=bool)
    if disc_source:
        dead = vy < 0
    base = blank_batch(n, dtype)
    return (
        base.replace(
            t=jnp.full((n,), 1.0, dtype=dtype) * t0,
            r=r,
            theta=theta,
            phi=jnp.full((n,), 1.0, dtype=dtype) * ph0,
            k=c.k,
            h=c.h,
            Q=c.Q,
            rdot_sign=c.rdot_sign,
            thetadot_sign=c.thetadot_sign,
            steps=jnp.where(dead, -1, 0).astype(jnp.int32),
            alpha=vz,  # store the local polar direction cosine
            beta=jnp.arctan2(vy, vx),
        ),
        npix,
    )
