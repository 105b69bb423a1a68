"""GR redshift machinery: emitted and received photon energies in observer
frames, batched over the ray axis.

Capability of the reference Raytracer redshift functions
(raytracer.cpp:342-600). Sign conventions for backward-traced image planes
are preserved exactly: the propagation runs with negated spin, so these
functions receive the *trace* spin and a ``reverse`` flag; where the
reference flips back to the physical spin for the metric/tetrad it does so
here too, and the photon's spatial momentum is reversed before the frame
projection (raytracer.cpp:367,409,488,541-544).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.destinations import Destination
from raytrace_tpu.geometry.kerr import metric_coeffs, metric_dot, momentum_from_consts
from raytrace_tpu.rays import RayBatch


def _orbit_et(r, theta, a, V):
    """Timelike tetrad leg of an observer orbiting at Omega = V."""
    g = metric_coeffs(r, theta, a)
    dv = V - g.omega
    gamma = 1.0 / jnp.sqrt(1.0 - dv * dv * g.e2psi / g.e2nu)
    ut = gamma / jnp.sqrt(g.e2nu)
    zero = jnp.zeros_like(ut)
    return g, (ut, zero, zero, ut * V)


def _energy_in_frame(rays: RayBatch, spin, et, g, reverse: bool):
    """E = g_munu et^mu p^nu with the photon momentum re-derived from the
    constants at the ray's current position (trace spin), spatial components
    reversed when tracing backwards."""
    pt, pr, ptheta, pphi = momentum_from_consts(
        rays.r, rays.theta, rays.k, rays.h, rays.Q, rays.rdot_sign, rays.thetadot_sign, spin
    )
    if reverse:
        pr, ptheta, pphi = -pr, -ptheta, -pphi
    return metric_dot(g, et, (pt, pr, ptheta, pphi))


def _resolve_V(V, a, r, theta, projradius: bool):
    """V = -1 selects the Keplerian circular orbit at the ray's radius,
    optionally using the radius projected parallel to the equatorial plane
    (raytracer.cpp:391-394)."""
    r_eff = r * jnp.sin(theta) if projradius else r
    kepler = 1.0 / (a + r_eff * jnp.sqrt(r_eff))
    V = jnp.asarray(V, dtype=jnp.result_type(r))
    return jnp.where(V == -1, kepler, V)


def redshift_start(
    rays: RayBatch, spin, V, reverse: bool = False, projradius: bool = False
) -> RayBatch:
    """Store the emitted energy of each ray in the frame of material at its
    *current* (initial) position orbiting at Omega = V (raytracer.cpp:342-417).

    Call before trace(); V = -1 selects the local Keplerian velocity.
    For image planes (reverse=True) the metric/tetrad use the physical spin
    (-spin) while the momentum derivation keeps the trace spin.
    """
    a = -spin if reverse else spin
    Vr = _resolve_V(V, a, rays.r, rays.theta, projradius)
    g, et = _orbit_et(rays.r, rays.theta, a, Vr)
    emit = _energy_in_frame(rays, spin, et, g, reverse)
    return rays.replace(emit=emit)


def ray_redshift(
    rays: RayBatch,
    spin,
    V=-1.0,
    reverse: bool = False,
    projradius: bool = False,
    motion: int = 0,
):
    """Redshift emit/recv (or recv/emit when reversed) at the ray endpoints.

    motion = 0: receiver orbits azimuthally at Omega = V (V = -1 Keplerian).
    motion = 1: receiver moves radially at dr/dt = V; V < 0 means |V| times
    the local coordinate speed of light (raytracer.cpp:528-535).
    """
    a = -spin if reverse else spin
    if motion == 0:
        Vr = _resolve_V(V, a, rays.r, rays.theta, projradius)
        g, et = _orbit_et(rays.r, rays.theta, a, Vr)
    else:
        g = metric_coeffs(rays.r, rays.theta, a)
        V = jnp.asarray(V, dtype=jnp.result_type(rays.r))
        # physical-spin form of the reference's (r^2 - 2r + 2a)/(r^2 + a^2)
        # local light speed scaling (raytracer.cpp:531 uses the trace spin)
        spd = (rays.r * rays.r - 2.0 * rays.r + spin + spin) / (
            rays.r * rays.r + spin * spin
        )
        Vr = jnp.where(V < 0, jnp.abs(V) * spd, V)
        ut = 1.0 / jnp.sqrt(g.g_tt + g.g_rr * Vr * Vr)
        zero = jnp.zeros_like(ut)
        et = (ut, Vr * ut, zero, zero)
    recv = _energy_in_frame(rays, spin, et, g, reverse)
    return jnp.where(reverse, recv / rays.emit, rays.emit / recv)


def ray_redshift_dest(rays: RayBatch, spin, dest: Destination, reverse: bool = False):
    """Redshift against the destination's 4-velocity field
    (raytracer.cpp:450-477,556-600).

    Note: the reference evaluates both the metric and the observer
    4-velocity with the *trace* spin here (no reversal) — consistent under
    the Kerr time-reversal symmetry (t -> -t, phi -> -phi <=> a -> -a) with
    the reversed spatial momentum; replicated faithfully.
    """
    et = dest.four_velocity(rays.r, rays.theta, rays.phi, spin)
    g = metric_coeffs(rays.r, rays.theta, spin)
    recv = _energy_in_frame(rays, spin, et, g, reverse)
    return jnp.where(reverse, recv / rays.emit, rays.emit / recv)


def apply_redshift(rays: RayBatch, spin, V=-1.0, reverse=False, projradius=False, motion=0) -> RayBatch:
    return rays.replace(
        redshift=ray_redshift(rays, spin, V, reverse, projradius, motion)
    )


def apply_redshift_dest(rays: RayBatch, spin, dest: Destination, reverse=False) -> RayBatch:
    return rays.replace(redshift=ray_redshift_dest(rays, spin, dest, reverse))


def range_phi(rays: RayBatch, lo=-jnp.pi, hi=jnp.pi) -> RayBatch:
    """Wrap phi into [lo, hi), skipping NaN/huge values and failed rays
    (raytracer.cpp:603-622)."""
    span = hi - lo
    wrapped = rays.phi - span * jnp.floor((rays.phi - lo) / span)
    ok = (jnp.abs(rays.phi) <= 1000) & jnp.isfinite(rays.phi) & (rays.steps > 0)
    return rays.replace(phi=jnp.where(ok, wrapped, rays.phi))
