"""Moving point sources: radial jets and arbitrary 4-velocities.

Capability of the reference's bitrotted JetPointSource (radial-motion
tetrad, src/raytracer/jetpointsource.cpp:156-229) and PointSourceVel
(Gram-Schmidt frame for a given 4-velocity, pointsource_vel.cpp:113-260),
re-derived cleanly: the source frame is the metric Gram-Schmidt tetrad of
the source 4-velocity, and the emission-direction grid is the same
(cos alpha, beta) solid-angle-uniform grid as the static lamppost.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.geometry.gramschmidt import gram_schmidt_tetrad
from raytrace_tpu.geometry.kerr import constants_from_frame, metric_coeffs
from raytrace_tpu.rays import RayBatch, blank_batch
from raytrace_tpu.sources.pointsource import PointSourceGrid


def radial_four_velocity(r, theta, v, spin):
    """u^mu of material moving radially at dr/dt = v (jet ejecta).

    Normalised against g_tt (dt)^2 + g_rr (dr)^2 = 1
    (jetpointsource.cpp:156-229 capability; same form as the reference's
    motion=1 redshift observer, raytracer.cpp:528-535).
    """
    g = metric_coeffs(r, theta, spin)
    ut = 1.0 / jnp.sqrt(g.g_tt + g.g_rr * v * v)
    zero = jnp.zeros_like(ut)
    return (ut, v * ut, zero, zero)


def _source_from_frame(pos, tet, spin, grid: PointSourceGrid, E, dtype):
    t0, r0, th0, ph0 = (jnp.asarray(p, dtype=dtype) for p in pos)
    i = jnp.arange(grid.n_cosalpha)
    j = jnp.arange(grid.n_beta)
    cosalpha = (grid.cosalpha0 + i[:, None] * grid.dcosalpha).astype(dtype)
    beta = (grid.beta0 + j[None, :] * grid.dbeta).astype(dtype)
    cosalpha, beta = jnp.broadcast_arrays(cosalpha, beta)
    cosalpha = cosalpha.reshape(-1)
    beta = beta.reshape(-1)
    dead = (cosalpha >= grid.cosalphamax) | (beta >= grid.betamax)

    alpha = jnp.arccos(jnp.clip(cosalpha, -1.0, 1.0))
    sin_a = jnp.sin(alpha)
    vx = sin_a * jnp.cos(beta)
    vy = sin_a * jnp.sin(beta)
    vz = cosalpha

    n = grid.n_rays
    r = jnp.full((n,), 1.0, dtype=dtype) * r0
    theta = jnp.full((n,), 1.0, dtype=dtype) * th0
    c = constants_from_frame(r, theta, tet, vx, vy, vz, spin, E)

    base = blank_batch(n, dtype)
    return base.replace(
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
        alpha=cosalpha,
        beta=beta,
    )


def point_source_vel(pos, u4, spin, grid: PointSourceGrid, E=1.0, dtype=jnp.float64) -> RayBatch:
    """Lamppost with an arbitrary timelike source 4-velocity u4 = (ut, ur,
    uth, uph) at pos (PointSourceVel capability)."""
    r0 = jnp.asarray(pos[1], dtype=dtype)
    th0 = jnp.asarray(pos[2], dtype=dtype)
    u4 = tuple(jnp.asarray(u, dtype=dtype) for u in u4)
    tet = gram_schmidt_tetrad(r0, th0, u4, spin)
    return _source_from_frame(pos, tet, spin, grid, E, dtype)


def jet_point_source(pos, v_radial, spin, grid: PointSourceGrid, E=1.0, dtype=jnp.float64) -> RayBatch:
    """Lamppost moving radially at dr/dt = v_radial (JetPointSource
    capability): jet/ejecta emission with relativistic beaming along r."""
    r0 = jnp.asarray(pos[1], dtype=dtype)
    th0 = jnp.asarray(pos[2], dtype=dtype)
    u4 = radial_four_velocity(r0, th0, jnp.asarray(v_radial, dtype=dtype), spin)
    return point_source_vel(pos, u4, spin, grid, E, dtype)
