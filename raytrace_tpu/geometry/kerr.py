"""Kerr spacetime geometry in Boyer-Lindquist coordinates (G = M = c = 1).

Pure, batched jnp functions providing the capability of the reference header
``src/include/kerr.h`` (horizon, ISCO, metric, tetrads, constants of motion,
momentum reconstruction). All functions broadcast over arbitrary leading batch
dimensions and preserve the dtype of their inputs; they are differentiable
with respect to every floating argument (including spin).

Conventions (matching the reference):
  * Signature (+,-,-,-): timelike vectors have g(u,u) = +1, null g(p,p) = 0.
  * Coordinates x^mu = (t, r, theta, phi).
  * Constants of motion for a photon: k = E (energy), h = L_z (z-angular
    momentum), Q (Carter constant, in the form used by kerr.h:324 — the
    combination Q + (k a cos0 + ...)(...) gives rho^4 thetadot^2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def horizon_radius(a, sign=1):
    """Event horizon radius r_+ = 1 + sqrt(1 - a^2) (kerr.h:13-20)."""
    return 1.0 + sign * jnp.sqrt((1.0 - a) * (1.0 + a))


def _isco_z12(a):
    z1 = 1.0 + jnp.cbrt(1.0 - a * a) * (jnp.cbrt(1.0 + a) + jnp.cbrt(1.0 - a))
    z2 = jnp.sqrt(3.0 * a * a + z1 * z1)
    return z1, z2


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def isco_radius(a, sign=1):
    """Innermost stable circular orbit radius (Bardeen, Press & Teukolsky 1972).

    ``sign=+1`` for prograde, ``-1`` for retrograde orbits (kerr.h:22-32).

    Custom JVP: the Bardeen expression sqrt((3-Z1)(3+Z1+2Z2)) vanishes
    quadratically at a = 0, so raw AD hits sqrt'(0) = inf there (0*inf =
    NaN) although the radius itself is perfectly regular; the custom rule
    is the exact chain rule with the vanishing ratio evaluated safely (the
    derivative at exactly a = 0 is the symmetric subgradient 0 of this
    even-in-spin parametrization — spin >= 0 by convention, orbit
    direction carried by ``sign``).
    """
    z1, z2 = _isco_z12(a)
    return 3.0 + z2 - sign * jnp.sqrt((3.0 - z1) * (3.0 + z1 + 2.0 * z2))


@isco_radius.defjvp
def _isco_radius_jvp(sign, primals, tangents):
    (a,) = primals
    (da,) = tangents
    (z1, z2), (dz1, dz2) = jax.jvp(_isco_z12, (a,), (da,))
    # u = 3 - z1 = (8/9)a^2 (1 + (7/27)a^2 + O(a^4)) cancels catastrophically
    # for small spins: z1 is computed from O(1) terms, so u carries an
    # absolute error ~3 eps that dominates once (8/9)a^2 ~ eps (a ~ 1e-8 in
    # f64) — dividing by sqrt(u v) then turns the spin-gradient into finite
    # garbage (~1e23 at a = 1e-8, vs the true -3.266). Below the crossover
    # |a| < eps^(1/4) (where the series truncation error meets the exact
    # branch's rounding error) we therefore evaluate u and u' from the
    # series; everything else (z2, v) is cancellation-free.
    a2 = a * a
    u_exact = 3.0 - z1
    u_series = (8.0 / 9.0) * a2 * (1.0 + (7.0 / 27.0) * a2)
    du_exact = -dz1
    du_series = (16.0 / 9.0) * a * (1.0 + (14.0 / 27.0) * a2) * da
    dtype = jnp.result_type(a)
    small = jnp.abs(a) < jnp.finfo(dtype).eps ** 0.25
    u = jnp.where(small, u_series, u_exact)
    du = jnp.where(small, du_series, du_exact)
    v = 3.0 + z1 + 2.0 * z2
    t = jnp.sqrt(u * v)
    # (u v)' / (2 t): both u and the numerator vanish ~a^2 at a = 0, so the
    # ratio's limit along da is the finite series slope (|dr/da| -> 4
    # sqrt(2/3) = 3.266 as a -> 0+, and exactly 0 at a = 0, the symmetric
    # subgradient of this even-in-spin parametrization). The floor only
    # guards literal 0/0 at a = 0 (numerator is 0 there too); it is scaled
    # to sqrt(tiny) so f32's t can't underflow past it into a blowup.
    floor = jnp.asarray(jnp.finfo(dtype).tiny, dtype) ** 0.5
    dt = (du * v + u * (2.0 * dz2 - du)) / (2.0 * jnp.maximum(t, floor))
    return 3.0 + z2 - sign * t, dz2 - sign * dt


def keplerian_omega(r, a, sign=1):
    """Angular velocity Omega = dphi/dt of a circular equatorial geodesic orbit.

    Omega = 1 / (a + sign * r^{3/2}) (kerr.h:34-38).
    """
    return 1.0 / (a + sign * r * jnp.sqrt(r))


def bl_to_cartesian(r, theta, phi, a):
    """Quasi-Cartesian coordinates of a Boyer-Lindquist point (kerr.h:40-56)."""
    rho = jnp.sqrt(r * r + a * a) * jnp.sin(theta)
    x = rho * jnp.cos(phi)
    y = rho * jnp.sin(phi)
    z = r * jnp.cos(theta)
    return x, y, z


class MetricCoeffs(NamedTuple):
    """Nonzero covariant Kerr metric components in the (e2nu, e2psi, omega)
    frame-dragging decomposition (kerr.h:93-124), plus the auxiliary scalars.

    g_tt = e2nu - omega^2 e2psi     g_tphi = omega * e2psi
    g_rr = -rhosq / delta           g_thth = -rhosq
    g_phph = -e2psi
    """

    g_tt: jnp.ndarray
    g_tphi: jnp.ndarray
    g_rr: jnp.ndarray
    g_thth: jnp.ndarray
    g_phph: jnp.ndarray
    rhosq: jnp.ndarray
    delta: jnp.ndarray
    sigmasq: jnp.ndarray
    e2nu: jnp.ndarray
    e2psi: jnp.ndarray
    omega: jnp.ndarray


def metric_coeffs(r, theta, a) -> MetricCoeffs:
    """Covariant Kerr metric at (r, theta) for spin a (kerr.h:93-124)."""
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    rhosq = r * r + (a * cos_t) * (a * cos_t)
    delta = r * r - 2.0 * r + a * a
    r2a2 = r * r + a * a
    sigmasq = r2a2 * r2a2 - a * a * delta * sin_t * sin_t
    e2nu = rhosq * delta / sigmasq
    e2psi = sigmasq * sin_t * sin_t / rhosq
    omega = 2.0 * a * r / sigmasq
    return MetricCoeffs(
        g_tt=e2nu - omega * omega * e2psi,
        g_tphi=omega * e2psi,
        g_rr=-rhosq / delta,
        g_thth=-rhosq,
        g_phph=-e2psi,
        rhosq=rhosq,
        delta=delta,
        sigmasq=sigmasq,
        e2nu=e2nu,
        e2psi=e2psi,
        omega=omega,
    )


def metric_dot(g: MetricCoeffs, u, v):
    """GR dot product g_munu u^mu v^nu for 4-vectors given as (t,r,th,ph) tuples.

    Explicit bilinear form over the 5 nonzero components — elementwise VPU
    work, no 4x4 matmul (kerr.h:58-72).
    """
    ut, ur, uth, uph = u
    vt, vr, vth, vph = v
    return (
        g.g_tt * ut * vt
        + g.g_tphi * (ut * vph + uph * vt)
        + g.g_rr * ur * vr
        + g.g_thth * uth * vth
        + g.g_phph * uph * vph
    )


class Tetrad(NamedTuple):
    """Orthonormal tetrad of an orbiting observer, as (t,r,theta,phi) tuples.

    et: timelike basis vector (the observer 4-velocity).
    ephi, etheta, er: spacelike legs (kerr.h:126-170; note the reference's
    naming is e1 = phi-leg, e2 = theta-leg, e3 = r-leg).
    """

    et: tuple
    ephi: tuple
    etheta: tuple
    er: tuple


def orbit_tetrad(r, theta, a, V, g: MetricCoeffs | None = None) -> Tetrad:
    """Tetrad basis of an observer at (r, theta) orbiting at Omega = V.

    Mirrors kerr.h:126-170. The theta leg here is +1/sqrt(rhosq) d_theta;
    the source-frame constants-of-motion routine (`constants_from_angles`)
    uses the reference's sign convention for its theta leg internally.
    """
    if g is None:
        g = metric_coeffs(r, theta, a)
    e2nu, e2psi, omega, rhosq, delta = g.e2nu, g.e2psi, g.omega, g.rhosq, g.delta
    dv = V - omega
    gamma = 1.0 / jnp.sqrt(1.0 - dv * dv * e2psi / e2nu)
    inv_sqrt_e2nu = 1.0 / jnp.sqrt(e2nu)
    zero = jnp.zeros_like(gamma)

    et = (inv_sqrt_e2nu * gamma, zero, zero, inv_sqrt_e2nu * gamma * V)
    # phi-leg (kerr.h:156-159)
    denom = jnp.sqrt(e2nu - dv * dv * e2psi)
    e1t = dv * jnp.sqrt(e2psi / e2nu) / denom
    e1ph = (e2nu + V * omega * e2psi - omega * omega * e2psi) / (
        jnp.sqrt(e2nu * e2psi) * denom
    )
    ephi = (e1t, zero, zero, e1ph)
    etheta = (zero, zero, 1.0 / jnp.sqrt(rhosq), zero)
    er = (zero, jnp.sqrt(delta / rhosq), zero, zero)
    return Tetrad(et=et, ephi=ephi, etheta=etheta, er=er)


class GeodesicRates(NamedTuple):
    """Coordinate rates dx^mu/dlambda of a photon plus the raw squared rates.

    ``thetadot_sq`` and ``rdot_sq`` are kept *signed* (they go negative past a
    turning point) so the integrator can run the sign-flip bookkeeping that
    the reference does inline (raytracer.cpp:196-222).
    """

    pt: jnp.ndarray
    pr: jnp.ndarray
    ptheta: jnp.ndarray
    pphi: jnp.ndarray
    thetadot_sq: jnp.ndarray
    rdot_sq: jnp.ndarray
    # geometry byproducts, exposed so per-step consumers (ergosphere /
    # Killing-energy checks) don't pay sin/cos/rhosq again
    sin_t: jnp.ndarray
    cos_t: jnp.ndarray
    rhosq: jnp.ndarray
    inv_rhosq: jnp.ndarray


def geodesic_rates(r, theta, k, h, Q, rdot_sign, thetadot_sign, a) -> GeodesicRates:
    """Photon coordinate velocities from the constants of motion.

    This is the hot-path function: the semi-analytic geodesic equations give
    (pt, pphi) linearly in (k, h) and (ptheta, pr) via signed square roots of
    the Carter-separated quadratics (kerr.h:299-335). Called 4x per RK4 step
    and 7x per DOPRI5 step.
    """
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    sin2 = sin_t * sin_t
    rhosq = r * r + (a * cos_t) * (a * cos_t)
    delta = r * r - 2.0 * r + a * a
    # one fused reciprocal covers every division below (divides are the
    # costliest VPU ops in the kernel after sin/cos; this runs 4x per RK4
    # step and 7x per DOPRI5 step): 1/(rhosq*delta*sin^2) multiplied back by
    # sin^2 / rhosq*delta recovers both factors the rates need.
    # csrc/geodesic.cpp mirrors the exact op order so the cross-language fp
    # agreement (tests/test_native.py) is preserved.
    # sin2 floored at the dtype's smallest normal: at exactly sin^2 = 0
    # (polar-axis evaluation of an h = 0 ray) the fused reciprocal would be
    # inf and contaminate pt/pr with inf*0 = NaN; the floor confines the
    # genuine pole singularity to pphi/thetadot_sq (which go ~1/tiny and are
    # handled by the turning-point bookkeeping) exactly as the unfused
    # 1/(rhosq*delta) form did. No physical ray changes: sin2 > tiny
    # everywhere off the axis.
    tiny0 = jnp.asarray(jnp.finfo(jnp.result_type(sin2)).tiny, jnp.result_type(sin2))
    sin2 = jnp.maximum(sin2, tiny0)
    rd = rhosq * delta
    inv_all = 1.0 / (rd * sin2)
    inv_rhosq_delta = inv_all * sin2
    inv_sin2 = inv_all * rd
    inv_rhosq = delta * inv_rhosq_delta

    pt = ((rhosq * (r * r + a * a) + 2.0 * a * a * r * sin2) * k - 2.0 * a * r * h) * inv_rhosq_delta
    pphi = (2.0 * a * r * sin2 * k + (rhosq - 2.0 * r) * h) * inv_all

    # (k a cos + h cos/sin)(k a cos - h cos/sin) = cos^2 (k^2 a^2 - h^2/sin^2)
    cos2 = cos_t * cos_t
    ka = k * a
    thetadot_sq = (Q + cos2 * (ka * ka - h * h * inv_sin2)) * (
        inv_rhosq * inv_rhosq
    )
    # sqrt(|x|) floored at the dtype's smallest normal: rays launched exactly
    # at a turning point (sin(beta) = 0 lamppost rays, y = 0 image rays) have
    # x = 0 identically, where d sqrt(|x|)/dx is infinite and poisons
    # reverse-mode gradients; the floor changes the forward value by
    # sqrt(tiny), far below any physical scale.
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(thetadot_sq)).tiny,
                       jnp.result_type(thetadot_sq))
    ptheta = jnp.sqrt(jnp.maximum(jnp.abs(thetadot_sq), tiny)) * thetadot_sign

    rdot_sq = (k * pt - h * pphi - rhosq * ptheta * ptheta) * (delta * inv_rhosq)
    pr = jnp.sqrt(jnp.maximum(jnp.abs(rdot_sq), tiny)) * rdot_sign

    return GeodesicRates(pt, pr, ptheta, pphi, thetadot_sq, rdot_sq,
                         sin_t, cos_t, rhosq, inv_rhosq)


def momentum_from_consts(r, theta, k, h, Q, rdot_sign, thetadot_sign, a):
    """(pt, pr, ptheta, pphi) from the constants of motion (kerr.h:299-335)."""
    rates = geodesic_rates(r, theta, k, h, Q, rdot_sign, thetadot_sign, a)
    return rates.pt, rates.pr, rates.ptheta, rates.pphi


class PhotonConstants(NamedTuple):
    k: jnp.ndarray
    h: jnp.ndarray
    Q: jnp.ndarray
    rdot_sign: jnp.ndarray
    thetadot_sign: jnp.ndarray


def constants_from_angles(r, theta, alpha, beta, V, a, E=1.0) -> PhotonConstants:
    """Constants of motion for a photon emitted at local polar angles.

    The photon leaves a source at (r, theta) orbiting azimuthally at
    Omega = V, with direction (alpha, beta) in the source's orthonormal rest
    frame and energy E there: the locally-Minkowski momentum is
    E * (1, sin a cos b, sin a sin b, cos a). The frame legs are ordered
    (et, e_phi, e_theta, e_r) and the theta leg carries the reference's
    -1/sqrt(rhosq) orientation (raytracer.cpp:625-676).
    """
    g = metric_coeffs(r, theta, a)
    tet = orbit_tetrad(r, theta, a, V, g)
    sin_a = jnp.sin(alpha)
    # local frame momentum components
    p0 = E
    p1 = E * sin_a * jnp.cos(beta)  # along e_phi
    p2 = E * sin_a * jnp.sin(beta)  # along e_theta (reference orientation: -theta)
    p3 = E * jnp.cos(alpha)  # along e_r

    tdot = p0 * tet.et[0] + p1 * tet.ephi[0]
    phidot = p0 * tet.et[3] + p1 * tet.ephi[3]
    rdot = p3 * tet.er[1]
    thetadot = p2 * (-tet.etheta[2])  # e22 = -1/sqrt(rhosq) in the reference

    return constants_from_rates(r, theta, tdot, rdot, thetadot, phidot, a)


def constants_from_frame(r, theta, tet: Tetrad, vx, vy, vz, a, E=1.0) -> PhotonConstants:
    """Constants of motion for a photon launched along the unit direction
    (vx, vy, vz) in an arbitrary orthonormal frame.

    The frame legs are ordered (et, e_phi, e_theta, e_r) with the
    reference's *negative-theta* e2 orientation (the orientation
    gram_schmidt_tetrad produces; negate orbit_tetrad's etheta before
    passing). This generalises `constants_from_angles` to moving sources
    (radial jets, plunging material, arbitrary 4-velocities) and to
    HEALPix direction vectors (healpix_pointsource.cpp:11-109 capability).
    """
    comps = []
    for mu in range(4):
        comps.append(
            E
            * (
                tet.et[mu]
                + vx * tet.ephi[mu]
                + vy * tet.etheta[mu]
                + vz * tet.er[mu]
            )
        )
    tdot, rdot, thetadot, phidot = comps
    return constants_from_rates(r, theta, tdot, rdot, thetadot, phidot, a)


def constants_from_rates(r, theta, tdot, rdot, thetadot, phidot, a) -> PhotonConstants:
    """(k, h, Q) and initial signs from coordinate rates dx^mu/dlambda.

    Inverts the geodesic equations (raytracer.cpp:661-672): k from the
    timelike Killing vector, h from the axial one, Q from the theta equation.
    """
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    sin2 = sin_t * sin_t
    rhosq = r * r + (a * cos_t) * (a * cos_t)

    k = (1.0 - 2.0 * r / rhosq) * tdot + (2.0 * a * r * sin2 / rhosq) * phidot

    denom = r * r + a * a * cos_t * cos_t - 2.0 * r
    h = phidot * ((r * r + a * a) * denom * sin2 + 2.0 * a * a * r * sin2 * sin2)
    h = (h - 2.0 * a * r * k * sin2) / denom

    cot = cos_t / sin_t
    Q = (rhosq * rhosq) * thetadot * thetadot - (a * k * cos_t + h * cot) * (
        a * k * cos_t - h * cot
    )

    rdot_sign = jnp.where(rdot >= 0, 1.0, -1.0).astype(jnp.result_type(r))
    thetadot_sign = jnp.where(thetadot > 0, 1.0, -1.0).astype(jnp.result_type(r))
    return PhotonConstants(k=k, h=h, Q=Q, rdot_sign=rdot_sign, thetadot_sign=thetadot_sign)


def constants_from_p(r, theta, pt, pr, ptheta, pphi, a) -> PhotonConstants:
    """(k, h, Q) from a contravariant 4-momentum at (r, theta).

    Note: the reference's `calculate_constants_from_p` (raytracer.cpp:690)
    feeds `pr` into the Killing-energy formula where `pt` belongs; the bug is
    masked because its only caller (ImagePlane) immediately overwrites k, h
    and Q with analytic impact-parameter values. We implement the correct
    contraction here.
    """
    return constants_from_rates(r, theta, pt, pr, ptheta, pphi, a)


def circular_orbit_velocity(r, a, sign=1):
    """4-velocity (u^t, 0, 0, u^phi) and Omega of a circular equatorial orbit.

    Stable-orbit constants of motion route (kerr.h:215-247).
    """
    u = 1.0 / r
    root = jnp.sqrt(u * u * u)
    den = jnp.sqrt(1.0 - 3.0 * u + sign * 2.0 * a * root)
    k = (1.0 - 2.0 * u + sign * a * root) / den
    h = sign * (1.0 + a * a * u * u - sign * 2.0 * a * root) / (jnp.sqrt(u) * den)

    denom = r * r * (1.0 - 2.0 / r) * (r * r + a * a) + 2.0 * a * a * r
    ut = ((r * r * (r * r + a * a) + 2.0 * a * a * r) * k - 2.0 * a * r * h) / denom
    uphi = (2.0 * a * r * k + (r * r - 2.0 * r) * h) / denom
    zero = jnp.zeros_like(ut)
    return (ut, zero, zero, uphi), uphi / ut


def lorentz_factor(r, theta, u, a):
    """Lorentz factor of 4-velocity u measured by the local ZAMO (kerr.h:172-213).

    Returns (gamma, v) where v is the 3-velocity in the ZAMO frame ordered
    (v_phi, v_theta, v_r) as in the reference.
    """
    g = metric_coeffs(r, theta, a)
    tet = orbit_tetrad(r, theta, a, g.omega, g)  # ZAMO: orbits at omega
    gamma = metric_dot(g, u, tet.et)
    gv_phi = metric_dot(g, u, tet.ephi)
    gv_theta = metric_dot(g, u, tet.etheta)
    gv_r = metric_dot(g, u, tet.er)
    return gamma, (gv_phi / gamma, gv_theta / gamma, gv_r / gamma)
