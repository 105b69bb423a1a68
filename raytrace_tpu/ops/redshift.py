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
from raytrace_tpu.rays import RAY_STATUS_DEST, RAY_STATUS_RLIM, RayBatch


def _sanitize(rays: RayBatch) -> RayBatch:
    """Evaluate redshift quantities at a benign point for rays where the
    result is meaningless anyway (dead padding at r = 0, horizon captures
    where the orbiting-observer tetrad is singular, stuck rays).

    Keeps both forward values and reverse-mode gradients finite; every app
    filter already excludes these rays (steps > 0 plus either a destination
    hit or a physically sensible position), and r_horizon < r_isco for all
    spins so a sanitized horizon ray can never sneak into a disc bin.
    """
    meaningful = (rays.steps > 0) & (
        ((rays.status & (RAY_STATUS_DEST | RAY_STATUS_RLIM)) != 0)
    ) | (rays.steps == 0)  # untraced batches keep their (valid) source state
    one = jnp.ones_like(rays.k)
    return rays.replace(
        r=jnp.where(meaningful, rays.r, 10.0),
        theta=jnp.where(meaningful, rays.theta, 1.0),
        k=jnp.where(meaningful, rays.k, one),
        h=jnp.where(meaningful, rays.h, 0.0 * one),
        Q=jnp.where(meaningful, rays.Q, one),
    )


def _orbit_et(r, theta, a, V):
    """Timelike tetrad leg of an observer orbiting at Omega = V.

    The Lorentz-factor argument 1 - dv^2 e2psi/e2nu goes negative where
    the requested orbit is spacelike (r below the photon circular-orbit
    radius — equator crossers on their way into the horizon). Those rays'
    redshifts are meaningless and every hit mask excludes them
    (r_ph < r_isco for all spins), but an unclamped sqrt(negative) is NaN
    in the PRIMAL, and reverse-mode AD then poisons shared cotangents
    through the masked branch (0 * NaN): clamp to the dtype tiny so both
    the value and its adjoint stay finite garbage instead."""
    g = metric_coeffs(r, theta, a)
    dv = V - g.omega
    arg = 1.0 - dv * dv * g.e2psi / g.e2nu
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(arg)).tiny, jnp.result_type(arg))
    gamma = 1.0 / jnp.sqrt(jnp.maximum(arg, tiny))
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
    rs = _sanitize(rays)
    Vr = _resolve_V(V, a, rs.r, rs.theta, projradius)
    g, et = _orbit_et(rs.r, rs.theta, a, Vr)
    emit = _energy_in_frame(rs, spin, et, g, reverse)
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
    rs = _sanitize(rays)
    if motion == 0:
        Vr = _resolve_V(V, a, rs.r, rs.theta, projradius)
        g, et = _orbit_et(rs.r, rs.theta, a, Vr)
    else:
        g = metric_coeffs(rs.r, rs.theta, a)
        V = jnp.asarray(V, dtype=jnp.result_type(rs.r))
        # the reference scales |V| by the local coordinate light speed using
        # the trace spin (raytracer.cpp:531)
        spd = (rs.r * rs.r - 2.0 * rs.r + spin + spin) / (
            rs.r * rs.r + spin * spin
        )
        Vr = jnp.where(V < 0, jnp.abs(V) * spd, V)
        # same clamp rationale as _orbit_et: the radial frame is spacelike
        # inside the ergosphere for large |V|; keep value/adjoint finite
        arg = g.g_tt + g.g_rr * Vr * Vr
        tiny = jnp.asarray(jnp.finfo(jnp.result_type(arg)).tiny,
                           jnp.result_type(arg))
        ut = 1.0 / jnp.sqrt(jnp.maximum(arg, tiny))
        zero = jnp.zeros_like(ut)
        et = (ut, Vr * ut, zero, zero)
    recv = _energy_in_frame(rs, spin, et, g, reverse)
    return jnp.where(reverse, recv / rays.emit, rays.emit / recv)


def ray_redshift_dest(rays: RayBatch, spin, dest: Destination, reverse: bool = False):
    """Redshift against the destination's 4-velocity field
    (raytracer.cpp:450-477,556-600).

    Note: the reference evaluates both the metric and the observer
    4-velocity with the *trace* spin here (no reversal) — consistent under
    the Kerr time-reversal symmetry (t -> -t, phi -> -phi <=> a -> -a) with
    the reversed spatial momentum; replicated faithfully.
    """
    rs = _sanitize(rays)
    et = dest.four_velocity(rs.r, rs.theta, rs.phi, spin)
    g = metric_coeffs(rs.r, rs.theta, spin)
    recv = _energy_in_frame(rs, spin, et, g, reverse)
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
